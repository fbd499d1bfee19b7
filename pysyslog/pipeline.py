"""End-to-end pipeline: scan → detokenize → parse → enrich → route →
aggregate, with per-partition lineage, metrics, and checkpoint/resume.

⇔ BASELINE.json north_rule.  Designed for 10^12-row Iceberg inputs:

* the input is bucketed into `n_buckets` deterministic ranges of doc_id
  hash; each bucket is an independent, idempotent unit of work
  (sandbox proxy for Iceberg snapshot/partition-level commits);
* a JSON manifest records completed buckets + per-bucket metrics
  (rows in, parse failures, token round-trip violations, rows routed) —
  rerunning skips completed buckets (resume-from-checkpoint);
* explicit `repartition` before the parse stage so the Arrow UDF
  saturates all cores regardless of input file layout;
* AQE left on for shuffle coalescing / skew splitting.

Run via spark-submit:  spark-submit --py-files pysyslog.zip -m pysyslog.pipeline ...
(entry: `main()`), or programmatically via `run_pipeline`.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from .aggregate import pipeline_counts
from .enrich import enrich
from .options import ParserOptions
from .parser import parse_syslog
from .route import route_by_facility_severity
from .tokens import detokenize, retokenize


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_pipeline_manifest.json")


def load_manifest(out_dir: str) -> dict:
    p = _manifest_path(out_dir)
    if os.path.exists(p):
        with open(p) as fh:
            return json.load(fh)
    return {"buckets": {}, "metrics": {}}


def save_manifest(out_dir: str, manifest: dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tmp = _manifest_path(out_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(out_dir))


def transform(tokens_df: DataFrame, options: ParserOptions,
              parse_partitions: int | None = None,
              emit_parsed_json: bool = False) -> DataFrame:
    """The logical plan shared by batch pipeline, bench, and tests:
    (detokenize+parse fused into one Arrow crossing) → enrich.
    Pure — no writes."""
    from .parser import parse_syslog_tokens

    # Callers persist the frame this returns (bench stage 1, run_pipeline
    # per bucket).  Columnar-cache compression is a bad trade for it:
    # the wide columns are near-unique strings (raw, message, content,
    # sdata_json, rendered datetimes) that barely compress — measured
    # 372 MB compressed vs 454 MB raw at bench scale (1.22x) while the
    # encode/decode cost 30-50% of the cache-build wall (2.2s -> 3.2s
    # steady-state build+count) plus decode on every downstream scan
    # (guide §2.3: for high-entropy payloads compression is pure
    # overhead — measure both; we did).  That ratio is a property of
    # the enriched schema, not of the scale factor, so the default
    # holds at 10^12 rows; override via PSL_CACHE_COMPRESS=true where
    # cache memory is the binding constraint.
    tokens_df.sparkSession.conf.set(
        "spark.sql.inMemoryColumnarStorage.compressed",
        os.environ.get("PSL_CACHE_COMPRESS", "false"))
    # First-level vectorized aggregate hash map (off by default in
    # Spark): every downstream aggregate of the enriched frame
    # (hourly/sink counts, salted host/program counts) measured a
    # consistent 5-10% faster with it across interleaved A/B reps
    # (hourly 2.30->2.14s, salted 1.89->1.55s, 600k rows).  Scale-safe:
    # it only changes the in-task partial-agg data structure, not the
    # plan; override via PSL_AGG_VECTORIZED_MAP=false.
    tokens_df.sparkSession.conf.set(
        "spark.sql.codegen.aggregate.map.vectorized.enable",
        os.environ.get("PSL_AGG_VECTORIZED_MAP", "true"))
    df = tokens_df
    if parse_partitions:
        df = df.repartition(parse_partitions)
    parsed = parse_syslog_tokens(df, "tokens", options,
                                 emit_parsed_json=emit_parsed_json)
    return enrich(parsed)


def run_pipeline(
    spark: SparkSession,
    tokens_df: DataFrame,
    out_dir: str,
    options: ParserOptions,
    n_buckets: int = 4,
    verify_roundtrip: bool = True,
) -> dict:
    """Bucketed, resumable batch run. Returns the manifest."""
    manifest = load_manifest(out_dir)
    parallelism = spark.sparkContext.defaultParallelism

    bucket_col = F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets))
    for b in range(n_buckets):
        key = str(b)
        if manifest["buckets"].get(key, {}).get("status") == "done":
            continue
        t0 = time.time()
        part = tokens_df.filter(bucket_col == b)
        enriched = transform(part, options, parse_partitions=parallelism * 2)

        m: dict = {"bucket": b}
        if verify_roundtrip:
            rt = retokenize(detokenize(part), raw_col="raw", out_col="tokens_rt")
            m["roundtrip_violations"] = rt.filter(
                ~(F.col("tokens") == F.col("tokens_rt"))
            ).count()

        # tokens/message_raw are dead weight downstream (raw carries the
        # line for routed-row checks); dropping them halves cache bytes
        enriched = enriched.drop("tokens", "message_raw").persist()
        m["rows_in"] = enriched.count()
        m["parse_no_ts"] = enriched.filter(F.col("ts").isNull()).count()
        route_by_facility_severity(
            enriched, os.path.join(out_dir, f"bucket={b}"), mode="overwrite",
            rows_hint=m["rows_in"],
        )
        # one shuffled aggregate feeds BOTH the hourly table and the
        # per-sink totals (pipeline_counts) instead of two input scans
        base, hourly, sinks = pipeline_counts(enriched)
        base = base.persist()
        hourly.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"bucket={b}", "agg_hourly")
        )
        sinks.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"bucket={b}", "sink_counts")
        )
        base.unpersist()
        enriched.unpersist()

        m["seconds"] = round(time.time() - t0, 3)
        m["status"] = "done"
        manifest["buckets"][key] = m
        save_manifest(out_dir, manifest)  # commit point per bucket

    manifest["metrics"]["total_rows"] = sum(
        b.get("rows_in", 0) for b in manifest["buckets"].values()
    )
    save_manifest(out_dir, manifest)
    return manifest


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="pysyslog batch pipeline")
    ap.add_argument("--input", help="parquet dir of token table (default: generated)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--sf", type=float, default=0.001)
    ap.add_argument("--buckets", type=int, default=4)
    ap.add_argument("--now", type=float, default=None)
    ap.add_argument("--cpus", type=int, default=None,
                    help="local[] threads (default: existing session / local[*])")
    args = ap.parse_args(argv)

    builder = (
        SparkSession.builder.appName("pysyslog-pipeline")
        # the persisted pipeline_counts base is tiny (≤ sinks × hours
        # rows); without this AQE leaves it at shuffle.partitions
        # partitions and every derived view pays a near-empty task
        # storm (see bench.make_spark)
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                "true")
    )
    if args.cpus:
        builder = builder.master(f"local[{args.cpus}]")
    spark = builder.getOrCreate()
    from .gen import GEN_NOW_EPOCH, gen_tokens_df, rows_for_sf

    if args.input:
        tokens = spark.read.parquet(args.input)
    else:
        tokens = gen_tokens_df(spark, rows_for_sf(args.sf))
    opts = ParserOptions(
        now_epoch=args.now if args.now is not None else GEN_NOW_EPOCH,
        auto_detect_json=True,
        auto_detect_key_values=True,
    )
    manifest = run_pipeline(spark, tokens, args.out, opts, n_buckets=args.buckets)
    print(json.dumps(manifest["metrics"]))


if __name__ == "__main__":
    main()
