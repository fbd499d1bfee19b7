"""Benchmark harness (driver contract: one JSON line on stdout).

Headline metric follows BASELINE.json: end-to-end parsed syslog
lines/sec through detokenize → parse → enrich → route → aggregate over
the deterministic fixture-mix corpus at the given scale factor, plus
per-query seconds for the other engine operators on the sf-dir tables.

Env:
  SPARK_GRAFT_SF_DIR   table dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] threads (default 32)
  PSL_BENCH_SCALING=1  also run the pipeline at local[8] vs local[32]
                       (two-cluster-size proxy) and report efficiency
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


def pipeline_run(spark, n_rows: int, out_dir: str) -> dict:
    """One end-to-end pass; returns stage timings + lines/sec."""
    from pyspark.sql import functions as F

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


def main():
    from pysyslog.gen import rows_for_sf

    n_rows = rows_for_sf(SF)
    result: dict = {"sf": SF, "cpus": CPUS}

    tmp = tempfile.mkdtemp(prefix="pysyslog-bench-")
    try:
        spark = make_spark(CPUS)
        pipe = pipeline_run(spark, n_rows, os.path.join(tmp, f"c{CPUS}"))
        queries = run_queries(spark)
        queries["syslog_e2e_pipeline"] = pipe["total_sec"]
        spark.stop()

        result.update(
            {
                "metric": "syslog end-to-end lines/sec (detok→parse→enrich→route→agg)",
                "value": pipe["lines_per_sec"],
                "unit": "lines/sec",
                "pipeline": pipe,
                "queries": queries,
            }
        )

        if os.environ.get("PSL_BENCH_SCALING") == "1":
            scaling = {}
            for cpus in (8, 32):
                s = make_spark(cpus)
                r = pipeline_run(s, n_rows, os.path.join(tmp, f"scale{cpus}"))
                s.stop()
                scaling[f"local[{cpus}]"] = r
            eff = (
                scaling["local[32]"]["lines_per_sec"]
                / scaling["local[8]"]["lines_per_sec"]
                / 4.0
            )
            result["scaling"] = {
                "throughput_local8": scaling["local[8]"]["lines_per_sec"],
                "throughput_local32": scaling["local[32]"]["lines_per_sec"],
                "efficiency_8_to_32": round(eff, 3),
                "detail": scaling,
            }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
