"""Per-sink adaptive salting in route_by_facility_severity (guide §2.5
hot keys / §6 small files): a hot sink splits across multiple write
tasks (several files), small sinks keep one file, and the routed rows
are identical to an unsalted write."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pysyslog.route import route_by_facility_severity


@pytest.fixture()
def skewed(spark):
    # 2000 rows for the hot sink, 40 each for two small ones
    n_hot, n_small = 2000, 40
    df = spark.range(n_hot + 2 * n_small).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.when(F.col("id") < n_hot, F.lit("user"))
        .when(F.col("id") < n_hot + n_small, F.lit("mail"))
        .otherwise(F.lit("ftp"))
        .alias("facility_name"),
        F.when(F.col("id") < n_hot, F.lit("notice"))
        .otherwise(F.lit("info"))
        .alias("severity_name"),
        F.col("id").alias("payload"),
    )
    return df, n_hot, n_small


def _files(path):
    out = {}
    for root, _dirs, files in os.walk(path):
        pq = [f for f in files if f.endswith(".parquet")]
        if pq:
            rel = os.path.relpath(root, path)
            out[rel] = len(pq)
    return out


def test_adaptive_salt_splits_hot_sink_only(spark, skewed, tmp_path):
    df, n_hot, n_small = skewed
    total = n_hot + 2 * n_small
    out = str(tmp_path / "adaptive")
    # at this toy size AQE's partition coalescing would (correctly)
    # merge the salt pieces back into one task — disable it so the test
    # observes the salt itself, not AQE's size-based task packing
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    spark.conf.set(coalesce_key, "false")
    try:
        route_by_facility_severity(df, out, rows_hint=total,
                                   max_records_per_file=1_000_000)
    finally:
        spark.conf.set(coalesce_key, "true")
    files = _files(os.path.join(out, "by_facility_severity"))
    # hot sink: salt width ceil(2000/target) > 1 spreads it over
    # several write tasks; small sinks keep width 1 → exactly one file
    assert files["facility_name=user/severity_name=notice"] > 1
    assert files["facility_name=mail/severity_name=info"] == 1
    assert files["facility_name=ftp/severity_name=info"] == 1

    # routed-row equality vs the legacy uniform-salt write
    out2 = str(tmp_path / "uniform")
    route_by_facility_severity(df, out2, files_per_sink=1)
    a = spark.read.parquet(os.path.join(out, "by_facility_severity"))
    b = spark.read.parquet(os.path.join(out2, "by_facility_severity"))
    key = lambda frame: {
        r["doc_id"]: (r["facility_name"], r["severity_name"], r["payload"])
        for r in frame.collect()
    }
    assert key(a) == key(b)
    assert len(key(a)) == total


def test_null_sink_names_route_to_unknown(spark, tmp_path):
    df = spark.createDataFrame(
        [("d1", None, None, 1), ("d2", "user", "info", 2)],
        "doc_id string, facility_name string, severity_name string, payload long",
    )
    out = str(tmp_path / "nulls")
    route_by_facility_severity(df, out, rows_hint=2)
    files = _files(os.path.join(out, "by_facility_severity"))
    assert "facility_name=__unknown/severity_name=__unknown" in files
    assert "facility_name=user/severity_name=info" in files
