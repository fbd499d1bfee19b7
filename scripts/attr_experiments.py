"""Cost-attribution experiments for the headline pipeline (guide §1):
build the enriched cache once, then time each downstream shape under
config variants.  Investigation tool only — results feed
OPTIMIZATION_r07.md; nothing here runs in the measured bench."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pysyslog.aggregate import pipeline_counts, salted_counts
from pysyslog.gen import GEN_NOW_EPOCH, gen_tokens_df, rows_for_sf
from pysyslog.options import ParserOptions
from pysyslog.pipeline import transform
from pysyslog.route import route_by_facility_severity


def t(label, fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    print(f"{label}: {best:.3f}s", flush=True)
    return best


def main():
    n_rows = rows_for_sf(0.1)
    opts = ParserOptions(now_epoch=GEN_NOW_EPOCH, auto_detect_json=True,
                         auto_detect_key_values=True)
    spark = bench.make_spark(32)
    tmp = tempfile.mkdtemp(prefix="pysyslog-attr-", dir="/dev/shm")
    try:
        corpus = os.path.join(tmp, "corpus")
        gen_tokens_df(spark, n_rows, partitions=64).write.mode("overwrite").parquet(corpus)
        tokens = spark.read.parquet(corpus)

        # warmup python workers
        transform(tokens.limit(30000).repartition(32), opts).drop(
            "tokens", "message_raw").write.format("noop").mode("overwrite").save()

        # raw parse cost without persist/count downstream: noop sink
        t("parse+enrich -> noop (no persist)", lambda: transform(tokens, opts)
          .drop("tokens", "message_raw")
          .write.format("noop").mode("overwrite").save())

        # parse WITHOUT enrich joins
        from pysyslog.parser import parse_syslog_tokens
        t("parse only -> noop", lambda: parse_syslog_tokens(tokens, "tokens", opts)
          .drop("tokens", "message_raw")
          .write.format("noop").mode("overwrite").save())

        # detok+parse UDF alone, minimal projection
        t("parse only, project 3 cols -> noop",
          lambda: parse_syslog_tokens(tokens, "tokens", opts)
          .select("facility_int", "priority_int", "epoch_us")
          .write.format("noop").mode("overwrite").save())

        # persist+count (the bench stage-1 shape)
        enriched = transform(tokens, opts).drop("tokens", "message_raw").persist()
        t("persist+count (stage1 shape)", lambda: enriched.count(), reps=1)
        t("count again (cache hit)", lambda: enriched.count())

        t("agg hourly on cache", lambda: pipeline_counts(enriched)[1].count())
        t("salted host on cache", lambda: salted_counts(enriched, "host").count())
        t("route write (default)", lambda: route_by_facility_severity(
            enriched, os.path.join(tmp, "r1"), rows_hint=n_rows))

        # route write variants: uncompressed / dictionary off
        def route_variant(path, **writer_opts):
            from pyspark.sql import functions as F
            salt = F.pmod(F.xxhash64("doc_id"), F.lit(1))
            routed = (enriched
                      .withColumn("facility_name", F.coalesce("facility_name", F.lit("__unknown")))
                      .withColumn("severity_name", F.coalesce("severity_name", F.lit("__unknown")))
                      .repartition(F.col("facility_name"), F.col("severity_name"), salt))
            w = routed.write.mode("overwrite").option("maxRecordsPerFile", 1_000_000)
            for k, v in writer_opts.items():
                w = w.option(k, v)
            w.partitionBy("facility_name", "severity_name").parquet(path)

        t("route write uncompressed", lambda: route_variant(
            os.path.join(tmp, "r2"), compression="uncompressed"))
        t("route write lz4", lambda: route_variant(
            os.path.join(tmp, "r3"), compression="lz4raw"))
        t("route write dict-off snappy", lambda: route_variant(
            os.path.join(tmp, "r4"), **{"parquet.enable.dictionary": "false",
                                        "compression": "snappy"}))

        enriched.unpersist()

        # cache compression off variant
        spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "false")
        e2 = transform(tokens, opts).drop("tokens", "message_raw").persist()
        t("persist+count (cache compress OFF)", lambda: e2.count(), reps=1)
        t("agg hourly on cache (compress OFF)", lambda: pipeline_counts(e2)[1].count())
        t("salted host on cache (compress OFF)", lambda: salted_counts(e2, "host").count())
        e2.unpersist()
        spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "true")

        # dim build cost (3 broadcast dims per transform call)
        from pysyslog.enrich import host_dim
        from pysyslog.tables import facility_dim, severity_dim
        t("build+broadcast dims (count)", lambda: (
            severity_dim(spark).count(), facility_dim(spark).count(),
            host_dim(spark).count()))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
