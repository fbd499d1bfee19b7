"""Multi-line record reassembly (batch form).

⇔ parse_syslog_lines (Line.pm:1044-1070): lines starting with
whitespace are continuations of the previous record; a record flushes
when a non-whitespace-led line arrives.

Distributed mapping (SURVEY.md §2.2): a running-sum window assigns a
record group id — `grp = sum(is_record_start) OVER (PARTITION BY source
ORDER BY line_no)` — then records are `\n`-joins of each group's lines
in order.  The window partitions by source/file, so parallelism is
per-source (bounded state, no global ordering).  The streaming version
lives in pysyslog.streaming.

Scale contract: ONE source serializes into ONE task — per-source line
ordering is the semantics (a continuation line belongs to the record
started on ITS stream), so it cannot be parallelized within a source
without breaking reassembly.  Throughput scales with the NUMBER of
sources, which in a real log estate is large (hosts × files); a single
giant source is the degenerate case and would bottleneck any engine
with these semantics, including the reference's sequential reader.
The streaming version (pysyslog/streaming.py) shares this contract via
its groupBy("source") state partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .options import ParserOptions
from .parser import parse_syslog


def reassemble(
    df: DataFrame,
    source_col: str = "source",
    line_no_col: str = "line_no",
    line_col: str = "line",
) -> DataFrame:
    """lines(source, line_no, line) -> records(source, record_no, raw)."""
    is_start = (~F.col(line_col).rlike(r"^\s")).cast("long")
    w = (
        Window.partitionBy(source_col)
        .orderBy(line_no_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grouped = df.withColumn("__grp", F.sum(is_start).over(w))
    # __grp == 0 -> leading continuation lines with no record start:
    # the reference leaves them in its buffer forever; we drop them.
    recs = (
        grouped.filter(F.col("__grp") > 0)
        .groupBy(source_col, "__grp")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col(line_no_col).alias("n"),
                                                F.col(line_col).alias("l")))
                    ),
                    lambda s: s["l"],
                ),
                "\n",
            ).alias("raw")
        )
        .withColumnRenamed("__grp", "record_no")
    )
    return recs


def parse_multiline(
    df: DataFrame,
    options: ParserOptions,
    source_col: str = "source",
    line_no_col: str = "line_no",
    line_col: str = "line",
) -> DataFrame:
    return parse_syslog(reassemble(df, source_col, line_no_col, line_col),
                        "raw", options)
