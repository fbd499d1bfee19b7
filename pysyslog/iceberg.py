"""Iceberg sink support with parquet fallback.

⇔ BASELINE.json north_star: route/aggregate sinks are per-sink Iceberg
tables with identity partition transforms.  This sandbox ships no
iceberg-spark-runtime jar, so the probe (`iceberg_available`) resolves
the catalog class at session build and the writers fall back to
partitioned parquet — the SAME DataFrame and partition columns either
way, so the plan shape (single scan, repartition-on-sink-keys, one
partitioned write) is identical and only the committer differs.

When a runtime jar is present (a real cluster), callers get:
  * `ensure_catalog` — registers a hadoop-type catalog over a warehouse
    path (config-only; no-op if already set);
  * `write_partitioned` — `df.writeTo(table).partitionedBy(identity
    cols).createOrReplace()`, i.e. snapshot-isolated per-sink commits,
    which is what makes the pipeline's bucket-resume (pipeline.py)
    transactional instead of directory-rename-based.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_PROBE_CACHE: dict[int, bool] = {}


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg Spark runtime is on the session classpath.
    Probed once per JVM (class resolution, no side effects)."""
    key = id(spark.sparkContext)
    hit = _PROBE_CACHE.get(key)
    if hit is None:
        try:
            spark._jvm.java.lang.Class.forName(
                "org.apache.iceberg.spark.SparkCatalog"
            )
            hit = True
        except Exception:
            hit = False
        _PROBE_CACHE[key] = hit
    return hit


def ensure_catalog(spark: SparkSession, name: str, warehouse: str) -> None:
    """Register a hadoop-type Iceberg catalog over `warehouse` (no-op
    when already configured)."""
    base = f"spark.sql.catalog.{name}"
    if spark.conf.get(base, None) is None:
        spark.conf.set(base, "org.apache.iceberg.spark.SparkCatalog")
        spark.conf.set(f"{base}.type", "hadoop")
        spark.conf.set(f"{base}.warehouse", warehouse)


def write_partitioned(
    df: DataFrame,
    parquet_path: str,
    partition_cols: list[str],
    iceberg_table: str | None = None,
    mode: str = "overwrite",
    max_records_per_file: int = 1_000_000,
    writer_options: dict[str, str] | None = None,
) -> str:
    """Partitioned sink write: Iceberg `writeTo` with identity partition
    transforms when the runtime exists (and a table name is given),
    else partitioned parquet.  Returns the sink identifier written."""
    spark = df.sparkSession
    if iceberg_table is not None and iceberg_available(spark):
        from pyspark.sql.functions import col

        writer = df.writeTo(iceberg_table).using("iceberg").option(
            "write.parquet.row-group-size-bytes", str(64 * 1024 * 1024)
        )
        # honor DataFrameWriter mode semantics exactly — the module
        # contract is "same behavior either way, only the committer
        # differs": append appends, error fails on an existing table,
        # ignore no-ops on an existing table, overwrite replaces
        if mode == "append":
            writer.append()
        elif mode in ("error", "errorifexists", "ignore"):
            # 'ignore' must only swallow the table-already-exists case;
            # a blanket except would report genuine write failures (IO,
            # schema mismatch, permissions) as success
            if mode == "ignore" and spark.catalog.tableExists(iceberg_table):
                return iceberg_table
            if partition_cols:
                writer = writer.partitionedBy(*[col(c) for c in partition_cols])
            writer.create()
        else:
            if partition_cols:
                writer = writer.partitionedBy(*[col(c) for c in partition_cols])
            writer.createOrReplace()
        return iceberg_table
    writer = df.write.mode(mode).option("maxRecordsPerFile",
                                        max_records_per_file)
    for k, v in (writer_options or {}).items():
        writer = writer.option(k, v)
    writer.partitionBy(*partition_cols).parquet(parquet_path)
    return parquet_path
