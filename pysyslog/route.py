"""Route stage: fan-out of parsed+enriched records into per-sink tables.

⇔ BASELINE.json north_star "route (fan-out by facility/severity/program
into per-sink Iceberg tables)".  The scalable fan-out is ONE partitioned
write — `partitionBy(facility_name, severity_name)` — not N filtered
jobs: a single scan feeds every sink and the writer splits files by
partition value.  In this sandbox the sink format is parquet; on a real
cluster the same DataFrame goes to `.writeTo(table)` (Iceberg) with
identity partition transforms — the plan shape is unchanged.

Per-program sinks use the same mechanism keyed by program_name, with a
cardinality cap (unknown/rare programs route to '__other') so a hostile
corpus cannot create unbounded partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F


ROUTE_COLS = ["facility_name", "severity_name"]

# Parquet dictionary encoding is disabled per-column for the
# high-cardinality text/identity fields of the enriched schema: the
# writer builds a dictionary per column chunk, overflows it on
# near-unique values (raw lines, message bodies, timestamps, ids), and
# falls back to PLAIN — paying the dictionary build for nothing.
# Measured at bench scale (600k rows, 192 sinks): 3.8s → 3.1s wall with
# BYTE-IDENTICAL total output size (113 MB), because these columns were
# ending up PLAIN after the fallback anyway.  Low-cardinality columns
# (host, program_name, facility/severity, source, tz, ...) keep
# dictionary encoding — disabling it globally grew the output 9% for no
# time win.  Cardinality is a property of the fields, not of the scale
# factor, so the split holds at 10^12 rows.
HIGH_CARDINALITY_COLS = (
    "doc_id", "raw", "message", "message_raw", "content", "datetime_raw",
    "epoch", "epoch_us", "ts", "sdata_json", "time", "datetime_utc",
    "datetime_local", "datetime_str", "program_pid",
)
NO_DICT_WRITER_OPTIONS = {
    f"parquet.enable.dictionary#{c}": "false" for c in HIGH_CARDINALITY_COLS
}


def route_by_facility_severity(
    enriched: DataFrame,
    out_dir: str,
    mode: str = "overwrite",
    max_records_per_file: int = 1_000_000,
    files_per_sink: int | None = None,
    rows_hint: int | None = None,
    iceberg_table: str | None = None,
) -> str:
    """Repartitions on (sink keys, bounded salt) before the partitioned
    write: without it every write task opens a parquet writer for every
    sink it sees (tasks × sinks tiny files — measured 4x slower at
    bench scale); with it each sink is written by ≤ files_per_sink
    tasks, and the salt keeps one hot sink from serializing into a
    single task.

    The salt granularity is sized to the DATA, not a constant: the salt
    exists so no write task holds more than ~max_records_per_file rows
    of one hot sink, so the right value is
    ceil(hot-sink rows / max_records_per_file) — a constant oversized
    salt at small volume shatters every sink into sub-file-size pieces
    (measured: salt 4 at 1.2M rows → 636 files of ~1900 rows, 1.6x
    slower than salt 1's 191 right-sized files), while a constant
    undersized salt at 10^12 rows serializes a hot sink into one task.
    Callers that know the input size pass `rows_hint`; the hot sink is
    budgeted as up to half the corpus.  Explicit `files_per_sink`
    overrides (and `None` with no hint keeps the legacy 4).

    With an Iceberg runtime on the classpath and `iceberg_table` given,
    the identical DataFrame goes through `writeTo(...)` with identity
    partition transforms instead (pysyslog.iceberg) — snapshot commits,
    same plan shape."""
    from .iceberg import write_partitioned

    if files_per_sink is None:
        if rows_hint is None:
            files_per_sink = 4
        else:
            files_per_sink = max(1, -(-rows_hint // (2 * max_records_per_file)))

    path = os.path.join(out_dir, "by_facility_severity")
    salt = F.pmod(F.xxhash64("doc_id"), F.lit(files_per_sink))
    routed = (
        enriched.withColumn("facility_name", F.coalesce("facility_name", F.lit("__unknown")))
        .withColumn("severity_name", F.coalesce("severity_name", F.lit("__unknown")))
        .repartition(F.col("facility_name"), F.col("severity_name"), salt)
    )
    return write_partitioned(
        routed, path, ROUTE_COLS, iceberg_table=iceberg_table, mode=mode,
        max_records_per_file=max_records_per_file,
        writer_options=NO_DICT_WRITER_OPTIONS,
    )


def route_by_program(
    enriched: DataFrame,
    out_dir: str,
    top_programs: int = 64,
    mode: str = "overwrite",
) -> str:
    """Per-program sinks, capped to the top-N programs by volume (the
    long tail routes to '__other').  The top-N set is computed with a
    salted count so a hot program doesn't skew the ranking shuffle."""
    from .aggregate import salted_counts

    path = os.path.join(out_dir, "by_program")
    top = [
        r["program_name"]
        for r in salted_counts(enriched.filter(F.col("program_name").isNotNull()),
                               "program_name")
        .orderBy(F.desc("n"), "program_name")
        .limit(top_programs)
        .collect()
    ]
    routed = enriched.withColumn(
        "program_sink",
        F.when(F.col("program_name").isin(top), F.col("program_name")).otherwise(
            F.lit("__other")
        ),
    )
    routed.write.mode(mode).partitionBy("program_sink").parquet(path)
    return path
