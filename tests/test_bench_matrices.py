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
