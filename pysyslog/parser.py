"""Spark integration: the vectorized syslog parse operator.

Design (SURVEY.md §3.1/§4): ONE Arrow-batched pandas UDF returning the
full fixed nullable StructType — never per-field UDFs (each would pay
the JVM↔Python boundary) and never row-at-a-time Python UDFs.  The
per-row state machine (pysyslog.parser_core, compiled regexes at module
import) is mapped over each Arrow batch; everything downstream (joins,
aggregations, routing) stays JVM-side in whole-stage codegen.

Schema mapping (SURVEY.md §1): the reference emits a *sparse* hash —
keys exist only if a fragment parsed.  Spark needs a fixed schema, so
every field is nullable, and `parsed_json` (optional) preserves the
exact present-key semantics for golden / routed-row equality checks.
`SDATA` (heterogeneous nested hash) maps to `sdata map<string,string>`
with dotted group keys plus `sdata_json` holding canonical JSON
(SURVEY.md §1.3).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from .goldens import canon, canonical_json
from .options import ParserOptions
from .parser_core import SyslogParser

_STR_FIELDS_1 = (
    "message_raw priority facility datetime_raw epoch datetime_utc "
    "datetime_local datetime_str tz date time host_raw host domain origin "
    "origin_date ntp program_raw program_name program_pid program_sub "
    "content message"
).split()

SYSLOG_SCHEMA = StructType(
    [StructField("preamble", IntegerType()),
     StructField("version", IntegerType()),
     StructField("priority_int", IntegerType()),
     StructField("facility_int", IntegerType())]
    + [StructField(f, StringType()) for f in _STR_FIELDS_1]
    + [
        StructField("epoch_us", LongType()),          # derived: exact micros
        StructField("sdata", MapType(StringType(), StringType())),
        StructField("sdata_json", StringType()),
        StructField("_json_error", StringType()),
        StructField("parsed_json", StringType()),      # populated on demand
    ]
)

FIELD_NAMES = [f.name for f in SYSLOG_SCHEMA.fields]
_INT_FIELDS = {"preamble", "version", "priority_int", "facility_int"}


def _flatten_sdata(sdata, prefix="", out=None):
    """Nested SDATA -> dotted-key flat map; non-scalar leaves (arrays,
    deeper JSON) render as canonical JSON strings."""
    if out is None:
        out = {}
    for k, v in sdata.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            _flatten_sdata(v, key + ".", out)
        elif isinstance(v, (list, tuple)):
            out[key] = json.dumps(canon(v), ensure_ascii=False, separators=(",", ":"))
        elif isinstance(v, bool):
            out[key] = "true" if v else "false"
        elif v is None:
            out[key] = None
        else:
            out[key] = str(v)
    return out


def _epoch_us(epoch_str) -> int | None:
    if not epoch_str:
        return None
    try:
        s, _, frac = str(epoch_str).partition(".")
        return int(s) * 1_000_000 + (int(frac[:6].ljust(6, "0")) if frac else 0)
    except ValueError:
        return None


def _field_value(msg: dict, f: str, emit_parsed_json: bool):
    if f in _INT_FIELDS:
        v = msg.get(f)
        return v if isinstance(v, int) and not isinstance(v, bool) else None
    if f == "epoch_us":
        return _epoch_us(msg.get("epoch"))
    if f == "sdata":
        sdata = msg.get("SDATA")
        return _flatten_sdata(sdata) if isinstance(sdata, dict) else None
    if f == "sdata_json":
        sdata = msg.get("SDATA")
        return (
            json.dumps(canon(sdata), sort_keys=True, ensure_ascii=False,
                       separators=(",", ":"))
            if sdata is not None
            else None
        )
    if f == "parsed_json":
        return canonical_json(msg) if emit_parsed_json else None
    v = msg.get(f)
    return str(v) if v is not None and not isinstance(v, str) else v


def record_to_row(msg: dict, emit_parsed_json: bool = False) -> tuple:
    """Parsed record dict -> tuple aligned with SYSLOG_SCHEMA."""
    return tuple(_field_value(msg, f, emit_parsed_json) for f in FIELD_NAMES)


# Per-worker parser cache: one compiled SyslogParser per options tuple,
# reused across all Arrow batches (⇔ the reference's precompiled %RE).
_PARSER_CACHE: dict = {}


def _get_parser(options: ParserOptions) -> SyslogParser:
    key = (options,)
    p = _PARSER_CACHE.get(key)
    if p is None:
        p = _PARSER_CACHE[key] = SyslogParser(options)
    return p


def make_parse_udf(options: ParserOptions, emit_parsed_json: bool = False):
    """Build the Arrow-batched parse UDF (options captured by closure;
    must have a pinned now_epoch for deterministic retries)."""
    from pyspark.sql.functions import pandas_udf

    if options.now_epoch is None:
        raise ValueError(
            "options.now_epoch must be pinned before distributing the parser "
            "(wall-clock reads inside tasks break retry determinism)"
        )

    # Hot-path field layout: the handful of special fields get explicit
    # slots; everything else is a plain dict get.  Columns accumulate
    # into per-field lists (pd.DataFrame(dict-of-lists) avoids the
    # row-tuple zip the list-of-tuples constructor pays).
    plain_fields = [
        f
        for f in FIELD_NAMES
        if f not in _INT_FIELDS
        and f not in ("epoch_us", "sdata", "sdata_json", "parsed_json")
    ]
    special = [f for f in FIELD_NAMES if f not in plain_fields]

    @pandas_udf(SYSLOG_SCHEMA)
    def parse_udf(raw: pd.Series) -> pd.DataFrame:
        parser = _get_parser(options)
        parse = parser.parse
        cols: dict[str, list] = {f: [] for f in FIELD_NAMES}
        plain_appends = [(f, cols[f].append) for f in plain_fields]
        special_appends = [(f, cols[f].append) for f in special]
        null_msg: dict = {}
        for s in raw:
            msg = parse(s) if s is not None else null_msg
            get = msg.get
            for f, append in plain_appends:
                v = get(f)
                append(str(v) if v is not None and not isinstance(v, str) else v)
            for f, append in special_appends:
                append(_field_value(msg, f, emit_parsed_json))
        return pd.DataFrame(cols, columns=FIELD_NAMES)

    return parse_udf


def make_parse_tokens_udf(options: ParserOptions, emit_parsed_json: bool = False):
    """Fused detokenize+parse UDF: tokens array<int32> -> parsed struct
    (with the raw line as message_raw/raw inside the struct).  One
    Python/Arrow boundary instead of two back-to-back ArrowEvalPython
    nodes — at 10^12 rows the second crossing is pure waste."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    if options.now_epoch is None:
        raise ValueError("options.now_epoch must be pinned (see make_parse_udf)")

    schema = StructType(SYSLOG_SCHEMA.fields + [StructField("raw", StringType())])
    field_names = FIELD_NAMES + ["raw"]
    plain_fields = [
        f
        for f in FIELD_NAMES
        if f not in _INT_FIELDS
        and f not in ("epoch_us", "sdata", "sdata_json", "parsed_json")
    ]
    special = [f for f in FIELD_NAMES if f not in plain_fields]

    @pandas_udf(schema)
    def parse_tokens_udf(tokens: pd.Series) -> pd.DataFrame:
        parser = _get_parser(options)
        parse = parser.parse
        cols: dict[str, list] = {f: [] for f in field_names}
        plain_appends = [(f, cols[f].append) for f in plain_fields]
        special_appends = [(f, cols[f].append) for f in special]
        raw_append = cols["raw"].append
        null_msg: dict = {}
        for arr in tokens:
            if arr is None:
                s, msg = None, null_msg
            else:
                s = np.asarray(arr, dtype=np.uint8).tobytes().decode("utf-8", "strict")
                msg = parse(s)
            raw_append(s)
            get = msg.get
            for f, append in plain_appends:
                v = get(f)
                append(str(v) if v is not None and not isinstance(v, str) else v)
            for f, append in special_appends:
                append(_field_value(msg, f, emit_parsed_json))
        return pd.DataFrame(cols, columns=field_names)

    return parse_tokens_udf


def parse_syslog_tokens(
    df: DataFrame,
    tokens_col: str = "tokens",
    options: ParserOptions | None = None,
    emit_parsed_json: bool = False,
    struct_col: str = "syslog",
) -> DataFrame:
    """Fused scan-side operator: detokenize+parse in one Arrow crossing,
    flattened, with the JVM-derived ts column (like parse_syslog)."""
    options = options or ParserOptions()
    udf = make_parse_tokens_udf(options, emit_parsed_json)
    out = df.withColumn(struct_col, udf(F.col(tokens_col)))
    out = out.select(*df.columns, f"{struct_col}.*")
    return out.withColumn("ts", F.timestamp_micros(F.col("epoch_us")))


def parse_syslog(
    df: DataFrame,
    raw_col: str | Column = "raw",
    options: ParserOptions | None = None,
    emit_parsed_json: bool = False,
    flatten: bool = True,
    struct_col: str = "syslog",
) -> DataFrame:
    """parse operator: adds the parsed struct (or its flattened fields).

    ⇔ parse_syslog_line applied column-wise (Line.pm:704-1014).  With
    flatten=True, fields become top-level columns plus a JVM-derived
    `ts` timestamp (from epoch_us; stays in whole-stage codegen for all
    downstream windowing).
    """
    options = options or ParserOptions()
    udf = make_parse_udf(options, emit_parsed_json)
    col = F.col(raw_col) if isinstance(raw_col, str) else raw_col
    out = df.withColumn(struct_col, udf(col))
    if flatten:
        existing = [c for c in df.columns]
        out = out.select(*existing, f"{struct_col}.*")
        out = out.withColumn("ts", F.timestamp_micros(F.col("epoch_us")))
    return out
