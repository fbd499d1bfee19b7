"""Benchmark harness (driver contract: one JSON line on stdout).

Headline metric follows BASELINE.json: end-to-end parsed syslog
lines/sec through detokenize → parse → enrich → route → aggregate over
the deterministic fixture-mix corpus at the given scale factor, plus
per-query seconds for the other engine operators on the sf-dir tables.

Env:
  SPARK_GRAFT_SF_DIR   table dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] threads (default 32)
  PSL_BENCH_SCALING    default 1: also run the pipeline at local[N] vs
                       local[4N] in fresh processes (two-cluster-size
                       proxy) and report efficiency; set 0 to skip
  PSL_BENCH_SCALE_N    small level N (default 2; see BASELINE.md for
                       why 2->8 and not 8->32 on this sandbox)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1


def make_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"pysyslog-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def pipeline_run(spark, n_rows: int, out_dir: str, warmup: bool = True) -> dict:
    """One end-to-end pass; returns stage timings + lines/sec.

    A warmup pass on a 5% slice runs first (not timed): it JIT-compiles
    the JVM paths and spins up the Python workers, so the timed pass
    measures steady-state throughput — comparable across process-fresh
    parallelism levels."""
    from pysyslog.aggregate import (
        hourly_facility_severity_counts,
        salted_counts,
        sink_counts,
    )
    from pysyslog.gen import GEN_NOW_EPOCH, gen_tokens_df
    from pysyslog.options import ParserOptions
    from pysyslog.pipeline import transform
    from pysyslog.route import route_by_facility_severity

    opts = ParserOptions(
        now_epoch=GEN_NOW_EPOCH, auto_detect_json=True, auto_detect_key_values=True
    )
    cpus = spark.sparkContext.defaultParallelism

    # materialize the corpus first so generation cost isn't measured
    corpus_path = os.path.join(out_dir, "corpus")
    gen_tokens_df(spark, n_rows, partitions=cpus * 2).write.mode("overwrite").parquet(
        corpus_path
    )
    tokens = spark.read.parquet(corpus_path)

    if warmup:
        w = transform(tokens.limit(max(n_rows // 20, 2000)), opts,
                      parse_partitions=cpus).drop("tokens", "message_raw").persist()
        w.count()
        route_by_facility_severity(w, os.path.join(out_dir, "warmup"))
        hourly_facility_severity_counts(w).count()
        w.unpersist()

    t0 = time.time()
    enriched = (
        transform(tokens, opts, parse_partitions=cpus * 2)
        .drop("tokens", "message_raw")
        .persist()
    )
    n = enriched.count()
    t_parse = time.time() - t0

    t1 = time.time()
    route_by_facility_severity(enriched, out_dir)
    t_route = time.time() - t1

    t2 = time.time()
    agg_rows = hourly_facility_severity_counts(enriched).count()
    sink_rows = sink_counts(enriched).count()
    host_rows = salted_counts(enriched, "host").count()
    t_agg = time.time() - t2

    enriched.unpersist()
    total = time.time() - t0
    return {
        "rows": n,
        "agg_rows": agg_rows,
        "sink_rows": sink_rows,
        "host_rows": host_rows,
        "parse_enrich_sec": round(t_parse, 3),
        "route_sec": round(t_route, 3),
        "agg_sec": round(t_agg, 3),
        "total_sec": round(total, 3),
        "lines_per_sec": round(n / total, 1),
    }


def run_queries(spark) -> dict[str, float]:
    """Headline operator queries on the sf-dir tables (seconds each)."""
    import __spark_entry__ as entry

    q = entry.queries()
    names = [
        "parse_pri",
        "agg_hourly",
        "tpch_pricing_summary",
        "tpch_nation_orders",
        "dedup_exact",
        "minhash_signatures",
        "quality_score",
        "ann_cosine_topk",
        "multiline_reassembly",
    ]
    out = {}
    for name in names:
        t0 = time.time()
        df = q[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
    return out


def config_matrix(n: int = 20000) -> dict[str, float]:
    """Single-thread throughput of the BATCH PARSE OPERATOR (the unit
    of work one executor core actually runs: vectorized clean-line fast
    path + state-machine remainder) across option presets (⇔ the
    reference's benchmarks/01-parse.pl cmpthese matrix — the option mix
    dominates parse cost there too).  Median of 3 passes per preset."""
    import statistics

    import numpy as np
    import pandas as pd

    from pysyslog.gen import GEN_NOW_EPOCH, synth_lines
    from pysyslog.options import ParserOptions
    from pysyslog.parser import (
        FIELD_NAMES,
        _INT_FIELDS,
        _fast_regex,
        _parse_batch,
    )
    from pysyslog.parser_core import SyslogParser

    base = ParserOptions(now_epoch=GEN_NOW_EPOCH)
    presets = {
        "defaults": base,
        "no_dates": base.with_(date_parsing=False),
        "no_program": base.with_(extract_program=False),
        "no_rfc_sdata": base.with_(rfc5424_structured_data=False),
        "strict_rfc": base.with_(rfc5424_strict=True),
        "json": base.with_(auto_detect_json=True),
        "kv": base.with_(auto_detect_key_values=True),
        "all_sdata": base.with_(auto_detect_json=True, auto_detect_key_values=True),
        "prune_empty": base.with_(prune_empty=True),
    }
    lines, _ = synth_lines(np.arange(n))
    raw = pd.Series(lines, dtype=object)
    plain = [
        f for f in FIELD_NAMES
        if f not in _INT_FIELDS
        and f not in ("epoch_us", "sdata", "sdata_json", "parsed_json")
    ]
    special = [f for f in FIELD_NAMES if f not in plain]
    out = {}
    for name, opts in presets.items():
        p = SyslogParser(opts)
        rx = _fast_regex(opts)
        _parse_batch(p, raw[:2000], opts, FIELD_NAMES, plain, special,
                     False, rx)  # warmup
        rates = []
        for _ in range(3):
            t0 = time.time()
            _parse_batch(p, raw, opts, FIELD_NAMES, plain, special, False, rx)
            rates.append(n / (time.time() - t0))
        out[name] = round(statistics.median(rates), 1)
    return out


def main():
    from pysyslog.gen import rows_for_sf

    n_rows = rows_for_sf(SF)
    result: dict = {"sf": SF, "cpus": CPUS}
    result["config_matrix_rows_per_sec_1core"] = config_matrix()

    tmp = tempfile.mkdtemp(prefix="pysyslog-bench-")
    try:
        spark = make_spark(CPUS)
        pipe = pipeline_run(spark, n_rows, os.path.join(tmp, f"c{CPUS}"))
        queries = run_queries(spark)
        queries["syslog_e2e_pipeline"] = pipe["total_sec"]
        spark.stop()

        result.update(
            {
                "metric": (
                    "syslog end-to-end wall seconds for "
                    f"{pipe['rows']} lines (detok→parse→enrich→route→agg); "
                    "throughput in throughput_lines_per_sec"
                ),
                "value": pipe["total_sec"],
                "unit": "sec",
                "throughput_lines_per_sec": pipe["lines_per_sec"],
                "pipeline": pipe,
                "queries": queries,
            }
        )

        if os.environ.get("PSL_BENCH_SCALING", "1") == "1":
            # N vs 4N parallelism proxy for the two-cluster-size rule.
            # Default window is local[2] -> local[8]: a raw-CPU probe on
            # this sandbox shows the 32 advertised vCPUs deliver only
            # ~1.5x the throughput of 8 (SMT/steal), so 8->32 measures
            # the hypervisor, not the plan; 2->8 is real parallelism.
            # each level runs in a FRESH python+JVM process so JIT warmth
            # can't leak between levels (same-process reruns measured
            # spuriously superlinear)
            import subprocess

            n_small = int(os.environ.get("PSL_BENCH_SCALE_N", "2"))
            scaling = {}
            for cpus in (n_small, n_small * 4):
                out_json = os.path.join(tmp, f"scale{cpus}.json")
                subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--scale-worker", str(cpus), str(n_rows),
                     os.path.join(tmp, f"scale{cpus}"), out_json],
                    check=True,
                    stdout=subprocess.DEVNULL,
                    stderr=subprocess.DEVNULL,
                )
                with open(out_json) as fh:
                    scaling[f"local[{cpus}]"] = json.load(fh)
            lo = scaling[f"local[{n_small}]"]["lines_per_sec"]
            hi = scaling[f"local[{n_small * 4}]"]["lines_per_sec"]
            result["scaling"] = {
                "n": n_small,
                "throughput_n": lo,
                "throughput_4n": hi,
                "efficiency_n_to_4n": round(hi / lo / 4.0, 3),
                "detail": scaling,
            }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    print(json.dumps(result))


def _scale_worker(argv):
    cpus, n_rows, out_dir, out_json = int(argv[0]), int(argv[1]), argv[2], argv[3]
    spark = make_spark(cpus)
    r = pipeline_run(spark, n_rows, out_dir)
    spark.stop()
    with open(out_json, "w") as fh:
        json.dump(r, fh)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scale-worker":
        _scale_worker(sys.argv[2:])
    else:
        main()
