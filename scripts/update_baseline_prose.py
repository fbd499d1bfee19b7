#!/usr/bin/env python
"""Regenerate the auto-maintained measured-results block in BASELINE.md
from the committed bench artifact (BENCH_DETAIL.json).

Why: the r3 verdict found BASELINE.md's round-status prose stranded —
the builder-night numbers were committed, then the driver's own bench
run overwrote BENCH_DETAIL.json and the prose no longer matched the
final artifact.  bench.py now calls this script after writing the
sidecar, so every number between the markers below is regenerated from
the very artifact the judge reads; a driver re-run can't strand it.

The block lives between `<!-- BENCH-AUTO-BEGIN -->` and
`<!-- BENCH-AUTO-END -->`; everything outside is hand-written history
and is never touched.
"""

from __future__ import annotations

import datetime
import json
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- BENCH-AUTO-BEGIN -->"
END = "<!-- BENCH-AUTO-END -->"


def _fmt_scaling(s: dict, label: str) -> list[str]:
    if not s:
        return []
    out = [
        f"- **{label}**: local[{s['n']}] {s['throughput_n']:,.0f} → "
        + (f"local[{s['n'] * 2}] {s['throughput_2n']:,.0f} → "
           if s.get("throughput_2n") else "")
        + f"local[{s['n'] * 4}] {s['throughput_4n']:,.0f} lines/s — "
        f"paired-median efficiency **{s['efficiency_n_to_4n']}** raw "
        f"(all paired: {s['efficiency_n_to_4n_all_paired']}), probe "
        f"{s['cpu_ceiling_probe_efficiency_n_to_4n']}, ceiling-adjusted "
        f"**{s['ceiling_adjusted_efficiency_n_to_4n']}**; "
        f"reps used {s['reps_used']}, discarded {s['reps_discarded']}"
        + (", **fallback_unfiltered**" if s.get("fallback_unfiltered")
           else "")
        + "."
    ]
    return out


def render(detail: dict) -> str:
    pipe = detail.get("pipeline", {})
    lines: list[str] = []
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%d %H:%MZ")
    lines.append(f"_Auto-generated from BENCH_DETAIL.json at {stamp} "
                 f"(sf={detail.get('sf')}, cpus={detail.get('cpus')}; "
                 "every number below appears verbatim in the committed "
                 "artifact)._")
    lines.append("")
    if pipe:
        rows = pipe.get("rows", 0)
        med = pipe.get("total_sec")
        lps = pipe.get("lines_per_sec")
        all_secs = pipe.get("all_pass_secs") or pipe.get("passes", [med])
        best = round(rows / min(all_secs), 1) if rows and all_secs else None
        lines.append(
            f"- **Headline**: median {med}s for {rows:,} lines = "
            f"**{lps:,.0f} lines/s**; best pass {min(all_secs)}s = "
            f"**{best:,.0f} lines/s**."
        )
        if "pass_probes" in pipe:
            lines.append(
                f"  Kept passes {pipe.get('passes', [med])} (probe-"
                f"bracketed, floor {pipe.get('probe_floor')} units/s = "
                f"0.75×fresh); discarded "
                f"{len(pipe.get('discarded_passes', []))} pass(es) in "
                "certified-bad windows: "
                f"{[d['total_sec'] for d in pipe.get('discarded_passes', [])]}."
                + (" **fallback_unfiltered** (no clean window found)."
                   if pipe.get("fallback_unfiltered") else "")
            )
        if "kept_spread_ratio" in pipe:
            # r6: spread flag + the one-sided-adjustment magnitude
            # (ADVICE r5 — plain medians next to the reported one)
            lines.append(
                f"  Kept-pass spread max/min {pipe['kept_spread_ratio']}×"
                + (f" (was {pipe.get('kept_spread_ratio_before_redo')}× "
                   "before the >3× spread redo pass)"
                   if pipe.get("spread_redo_ran") else "")
                + f"; unadjusted medians: true {pipe.get('median_kept_true')}s,"
                f" incl. discarded {pipe.get('median_all_incl_discarded')}s.")
        st = [pipe.get("parse_enrich_sec"), pipe.get("route_sec"),
              pipe.get("agg_sec")]
        if all(st):
            lines.append(f"  Median-pass stages: parse+enrich {st[0]}s, "
                         f"route {st[1]}s, aggregate {st[2]}s.")
    lines.extend(_fmt_scaling(detail.get("scaling"),
                              "Scaling (primary, 1→4)"))
    lines.extend(_fmt_scaling(detail.get("scaling_secondary_2to8"),
                              "Scaling (secondary, 2→8 — legacy window, "
                              "over-subscribed by design)"))
    cd = detail.get("cooldown")
    if cd:
        if "probe_fresh_sustained" in cd:
            # r5+ artifacts: the recovered-check is a sustained-probe
            # poll after an unconditional floor sleep
            lines.append(
                f"- **Cooldown before headline**: floor sleep "
                f"{cd.get('floor_sleep_sec', 0)}s, then sustained probe "
                f"{cd['probe_resumed_sustained']} vs fresh anchor "
                f"{cd['probe_fresh_sustained']} — recovered after "
                f"{cd['waited_sec']}s of polling.")
        else:
            lines.append(
                f"- **Cooldown before headline**: fresh wide probe "
                f"{cd['probe_fresh_wide']}, resumed "
                f"{cd['probe_resumed_wide']} after {cd['waited_sec']}s.")
    cm = detail.get("config_matrix_rows_per_sec_1core")
    if cm:
        order = sorted(cm, key=cm.get, reverse=True)
        ordered = " > ".join(f"{k} {cm[k]:,.0f}" for k in order)
        cmp_ = detail.get("config_matrix_probes", {})
        lines.append(
            f"- **Config matrix (1-core rows/s)**: {ordered}."
            f"  Window probes {cmp_.get('before')}/{cmp_.get('after')}"
            f" (ok={cmp_.get('window_ok')}, attempt {cmp_.get('attempt')}).")
    dm = detail.get("date_cohort_rows_per_sec_1core")
    if dm:
        lines.append(
            "- **Date-cohort matrix (1-core rows/s, defaults — ⇔ "
            "benchmarks/01-parse.pl iso/legacy/mixed)**: "
            + ", ".join(f"{k} {dm[k]:,.0f}" for k in ("iso", "legacy",
                                                      "mixed") if k in dm)
            + " (same probe window as the config matrix).")
    ab = detail.get("parse_pri_ab")
    if ab:
        lines.append(
            f"- **parse_pri A/B (regex step, PRI+BSD cohort)**: full "
            f"master {ab['master_full_us_per_row']}µs/row vs minimal "
            f"r2 shape {ab['minimal_r2_shape_us_per_row']}µs/row — ratio "
            f"{ab['ratio']}.")
    q = detail.get("queries")
    if q:
        qs = ", ".join(f"{k} {v}s" for k, v in q.items())
        lines.append(f"- **Per-query seconds**: {qs}.")
    probes = {k: detail.get(k) for k in
              ("probe_at_start", "probe_fresh_wide", "probe_fresh_pair")}
    lines.append(f"- **Box probes**: {json.dumps(probes)}.")
    b = detail.get("budget")
    if b:
        lines.append(
            f"- **Wall-clock budget**: {b.get('elapsed_at_emit_sec')}s "
            f"used of {b.get('budget_sec')}s; per-phase "
            f"{json.dumps(b.get('phase_sec', {}))}; "
            + (f"shed {json.dumps(b.get('shed'))}" if b.get("shed")
               else "nothing shed")
            + ".")
    ise = detail.get("initial_settle")
    if ise is not None:
        lines.append(
            f"- **Initial settle (probe-driven)**: {ise.get('waited_sec')}s"
            f" against anchor {ise.get('anchor')}.")
    if detail.get("stdout_dropped_keys"):
        lines.append(f"- stdout keys dropped for the driver line-length "
                     f"contract: {detail['stdout_dropped_keys']}.")
    return "\n".join(lines)


def main() -> int:
    detail_path = os.path.join(HERE, "BENCH_DETAIL.json")
    baseline_path = os.path.join(HERE, "BASELINE.md")
    with open(detail_path) as fh:
        detail = json.load(fh)
    block = render(detail)
    with open(baseline_path) as fh:
        text = fh.read()
    if BEGIN in text and END in text:
        head, rest = text.split(BEGIN, 1)
        _, tail = rest.split(END, 1)
        text = head + BEGIN + "\n" + block + "\n" + END + tail
    else:
        text = (text.rstrip() + "\n\n## Latest bench artifact "
                "(auto-generated)\n\n" + BEGIN + "\n" + block + "\n"
                + END + "\n")
    with open(baseline_path, "w") as fh:
        fh.write(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
