"""The bench harness's single-core matrices are part of the evidence
contract (BASELINE.md auto block; ⇔ reference benchmarks/01-parse.pl's
two dimensions: option presets and iso/legacy/mixed date cohorts).
These tests pin their SHAPE — keys, positivity, cohort membership — so
a harness refactor can't silently drop a dimension the prose renders.
No Spark session needed (both matrices time the batch parse operator
directly)."""

import sys

import pytest

sys.path.insert(0, ".")


@pytest.fixture(scope="module")
def bench_mod():
    import bench

    return bench


def test_config_matrix_shape(bench_mod):
    out = bench_mod.config_matrix(n=1000)
    assert set(out) == {
        "defaults", "no_dates", "no_program", "no_rfc_sdata",
        "strict_rfc", "json", "kv", "all_sdata", "prune_empty",
    }
    assert all(v > 0 for v in out.values())


def test_date_cohort_matrix_shape(bench_mod):
    out = bench_mod.date_cohort_matrix(n=1000)
    assert set(out) == {"iso", "legacy", "mixed"}
    assert all(v > 0 for v in out.values())


def test_date_cohorts_are_pure(bench_mod):
    """The iso cohort must contain only ISO8601-timestamped lines and
    the legacy cohort only BSD-dated lines — otherwise the dimension
    measures a mislabeled mix."""
    import re

    import numpy as np

    from pysyslog.gen import synth_lines

    iso_srcs = {"iso_micro", "iso_json", "rfc5424_sd"}
    lines, sources = synth_lines(np.arange(4000))
    iso_re = re.compile(r"^(?:<\d+>1? ?)?\d{4}-\d{2}-\d{2}T")
    bsd_re = re.compile(r"^(?:<\d+>)?[A-Z][a-z]{2}\s+\d{1,2} \d{2}:\d{2}:\d{2}")
    for line, src in zip(lines, sources):
        if src in iso_srcs:
            assert iso_re.match(line), (src, line[:60])
        elif src.startswith("bsd_"):
            assert bsd_re.match(line), (src, line[:60])


@pytest.fixture(scope="module")
def prose_mod():
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "update_baseline_prose.py")
    spec = importlib.util.spec_from_file_location("baseline_prose", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_prose_renders_committed_artifact(prose_mod):
    """render() must handle the CURRENT committed artifact — the bench
    invokes the renderer best-effort at the end of every headline run,
    so a renderer/artifact schema drift fails silently there and the
    committed BASELINE.md auto block goes stale (it happened in r5:
    the cooldown key rename broke it for three runs)."""
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_DETAIL.json")) as fh:
        detail = json.load(fh)
    block = prose_mod.render(detail)
    assert "**Headline**" in block
    assert "lines/s" in block
    assert "Scaling (primary" in block
    # every committed artifact since r4 carries the budget section
    assert "Wall-clock budget" in block


def test_prose_renders_both_cooldown_generations(prose_mod):
    """Pre-r5 artifacts record a burst-probe cooldown
    (probe_fresh_wide/probe_resumed_wide); r5+ record the
    sustained-probe floor (probe_fresh_sustained/...).  Both must
    render."""
    base = {
        "sf": 0.1, "cpus": 32,
        "pipeline": {"rows": 600000, "total_sec": 12.0,
                     "lines_per_sec": 50000.0, "parse_enrich_sec": 4.0,
                     "route_sec": 4.0, "agg_sec": 3.0},
    }
    old = dict(base, cooldown={"probe_fresh_wide": 11000.0,
                               "probe_resumed_wide": 10500.0,
                               "waited_sec": 420})
    new = dict(base, cooldown={"probe_fresh_sustained": 9000.0,
                               "probe_resumed_sustained": 9500.0,
                               "floor_sleep_sec": 300.0,
                               "waited_sec": 0.0})
    assert "Cooldown before headline" in prose_mod.render(old)
    assert "sustained probe" in prose_mod.render(new)


def test_main_crash_path_emits_partial(bench_mod, monkeypatch):
    """ADVICE r5: an unhandled exception inside the bench body must
    still produce the partial compact line (the r4 silent-exit failure
    mode via the crash door, not the signal door)."""
    calls = []
    monkeypatch.setattr(bench_mod, "emit_final",
                        lambda **kw: calls.append(kw))

    def boom():
        raise RuntimeError("spark died mid-headline")

    monkeypatch.setattr(bench_mod, "_main_body", boom)
    with pytest.raises(RuntimeError):
        bench_mod.main()
    assert calls and calls[0]["partial"] is True
    assert "spark died mid-headline" in calls[0]["reason"]


def test_pipeline_run_probe_gate_records_spread_and_plain_medians(
        bench_mod, spark, tmp_path, monkeypatch):
    """r5 verdict #2 + ADVICE r5: the probe-gated headline must record
    the kept-pass spread ratio, the spread-redo decision, and the
    UNADJUSTED medians (true/upper/including-discarded) alongside the
    reported lower-middle median."""
    monkeypatch.setattr(bench_mod.time, "sleep", lambda s: None)
    gate = {"probe": lambda: 1.0, "fresh": 1.0, "threshold": 0.0,
            "max_redos": 0, "recover_cap_sec": 0}
    out = bench_mod.pipeline_run(
        spark, 3000, str(tmp_path / "io"), warmup=False, passes=2,
        probe_gate=gate)
    # the redo decision itself is timing-dependent (a cold warmup=False
    # first pass vs steady state can exceed 3x on a tiny run), so assert
    # the DECISION matches the RECORDED ratio rather than a fixed outcome
    assert out["spread_redo_ran"] is (
        out["kept_spread_ratio_before_redo"] > 3.0)
    assert out["kept_spread_ratio_before_redo"] >= 1.0
    assert out["kept_spread_ratio"] >= 1.0
    ks = sorted(out["passes"])
    assert len(ks) == (3 if out["spread_redo_ran"] else 2)
    assert out["median_kept_upper"] == ks[len(ks) // 2]
    expected_true = (ks[len(ks) // 2] if len(ks) % 2
                     else sum(ks[len(ks) // 2 - 1:len(ks) // 2 + 1]) / 2)
    assert out["median_kept_true"] == pytest.approx(expected_true, abs=5e-4)
    assert out["median_all_incl_discarded"] >= min(ks)
    # reported value stays the lower-middle median on even counts
    assert out["total_sec"] == ks[(len(ks) - 1) // 2]
