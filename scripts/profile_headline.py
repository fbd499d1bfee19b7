"""One instrumented headline pass with the Spark UI enabled: dumps
per-stage wall/metrics via the REST API so the optimization work can
see where the seconds go (guide §7.1).  Investigation tool only."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def make_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName(f"pysyslog-profile-{CPUS}")
        .config("spark.sql.shuffle.partitions", str(max(CPUS * 4, 8)))
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .getOrCreate()
    )


def main():
    from pysyslog.aggregate import (
        hourly_facility_severity_counts,
        pipeline_counts,
        salted_counts,
    )
    from pysyslog.gen import GEN_NOW_EPOCH, gen_tokens_df, rows_for_sf
    from pysyslog.options import ParserOptions
    from pysyslog.pipeline import transform
    from pysyslog.route import route_by_facility_severity

    n_rows = rows_for_sf(0.1)
    opts = ParserOptions(now_epoch=GEN_NOW_EPOCH, auto_detect_json=True,
                         auto_detect_key_values=True)
    spark = make_spark()
    cpus = spark.sparkContext.defaultParallelism
    tmp = tempfile.mkdtemp(prefix="pysyslog-prof-", dir="/dev/shm")
    try:
        corpus = os.path.join(tmp, "corpus")
        gen_tokens_df(spark, n_rows, partitions=cpus * 2).write.mode(
            "overwrite").parquet(corpus)
        tokens = spark.read.parquet(corpus)
        w = transform(tokens.limit(max(n_rows // 20, 2000)).repartition(cpus),
                      opts).drop("tokens", "message_raw").persist()
        w.count()
        route_by_facility_severity(w, os.path.join(tmp, "warmup"), rows_hint=n_rows)
        hourly_facility_severity_counts(w).count()
        salted_counts(w, "host").count()
        w.unpersist()

        marks = {}
        t0 = time.time()
        enriched = transform(tokens, opts).drop("tokens", "message_raw").persist()
        spark.sparkContext.setJobDescription("T parse+enrich count")
        enriched.count()
        marks["parse_enrich"] = round(time.time() - t0, 3)
        t1 = time.time()
        spark.sparkContext.setJobDescription("T route")
        route_by_facility_severity(enriched, os.path.join(tmp, "out"), rows_hint=n_rows)
        marks["route"] = round(time.time() - t1, 3)
        t2 = time.time()
        spark.sparkContext.setJobDescription("T agg base+hourly")
        base, hourly, sinks = pipeline_counts(enriched)
        base = base.persist()
        hourly.count()
        marks["agg_hourly"] = round(time.time() - t2, 3)
        t3 = time.time()
        spark.sparkContext.setJobDescription("T agg sinks")
        sinks.count()
        marks["agg_sinks"] = round(time.time() - t3, 3)
        t4 = time.time()
        spark.sparkContext.setJobDescription("T agg salted-host")
        salted_counts(enriched, "host").count()
        marks["agg_salted_host"] = round(time.time() - t4, 3)
        base.unpersist()
        enriched.unpersist()
        marks["total"] = round(time.time() - t0, 3)
        print("WALL", json.dumps(marks))

        app = spark.sparkContext.applicationId
        base_url = f"http://localhost:4049/api/v1/applications/{app}"
        jobs = json.load(urllib.request.urlopen(f"{base_url}/jobs"))
        stages = json.load(urllib.request.urlopen(f"{base_url}/stages"))
        by_id = {s["stageId"]: s for s in stages if s["status"] == "COMPLETE"}
        for j in sorted(jobs, key=lambda x: x["jobId"]):
            desc = (j.get("description") or j["name"])[:60]
            if not desc.startswith("T "):
                continue
            sids = sorted(j["stageIds"])
            rows = []
            for sid in sids:
                s = by_id.get(sid)
                if not s:
                    continue
                rows.append(
                    f"  stage {sid} tasks={s['numCompleteTasks']} "
                    f"exec={s['executorRunTime']/1000:.1f}s "
                    f"cpu={s['executorCpuTime']/1e9:.1f}s "
                    f"srMB={s['shuffleReadBytes']/1e6:.0f} "
                    f"swMB={s['shuffleWriteBytes']/1e6:.0f} "
                    f"inMB={s['inputBytes']/1e6:.0f} "
                    f"outMB={s['outputBytes']/1e6:.0f} "
                    f"fetchWait={s.get('shuffleFetchWaitTime',0)/1000:.1f}s "
                    f"[{s['name'][:50]}]"
                )
            print(f"JOB {j['jobId']} {desc} sub={j['submissionTime']}")
            for r in rows:
                print(r)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
