"""Spark-side parse operator: golden equality through the Arrow UDF.

Runs the full fixture corpus through parse_syslog() on a real
SparkSession and checks parsed_json equality against the pure-Python
core (which is itself golden-verified in test_goldens.py), plus typed
column spot checks and plan shape.
"""

from __future__ import annotations

import json

import pytest

from pysyslog import ParserOptions, SyslogParser, options_from_perl
from pysyslog.goldens import GOLDEN_NOW_EPOCH, canonical_json, load_fixtures
from pysyslog.parser import parse_syslog

FIXTURES = load_fixtures()
BASE = ParserOptions(now_epoch=GOLDEN_NOW_EPOCH, default_tz="UTC")


def test_parse_corpus_through_spark(spark):
    # All-SDATA-on options cover every fixture's features in one pass
    opts = BASE.with_(auto_detect_json=True, auto_detect_key_values=True)
    rows = [(fid, FIXTURES[fid]["string"]) for fid in sorted(FIXTURES)]
    df = spark.createDataFrame(rows, "fixture_id string, raw string")
    out = parse_syslog(df, "raw", opts, emit_parsed_json=True).collect()

    core = SyslogParser(opts)
    by_id = {r["fixture_id"]: r for r in out}
    assert len(by_id) == len(FIXTURES)
    for fid, fx in FIXTURES.items():
        want = canonical_json(core.parse(fx["string"]))
        got = by_id[fid]["parsed_json"]
        assert got == want, f"{fid}: spark vs core mismatch"


def test_typed_columns_and_ts(spark):
    df = spark.createDataFrame(
        [("May 19 22:03:29 janus sshd[10173]: pam_unix(sshd:session): ok",)],
        "raw string",
    )
    row = parse_syslog(df, "raw", BASE).collect()[0]
    assert row["program_name"] == "sshd"
    assert row["program_pid"] == "10173"
    assert row["host"] == "janus"
    assert row["epoch_us"] == 1526767409_000000
    assert str(row["ts"]) == "2018-05-19 22:03:29"
    assert row["preamble"] is None  # absent key -> NULL


def test_sdata_map_flattening(spark):
    opts = BASE.with_(auto_detect_json=True)
    df = spark.createDataFrame(
        [('<163>Jul 26 15:50:14 h prog[1]: [foo x=1] hi {"a":{"b":2}}',)],
        "raw string",
    )
    row = parse_syslog(df, "raw", opts).collect()[0]
    assert row["sdata"]["foo.x"] == "1"
    assert row["sdata"]["a.b"] == "2"
    assert json.loads(row["sdata_json"]) == {"foo": {"x": "1"}, "a": {"b": "2"}}


def test_null_input_row(spark):
    df = spark.createDataFrame([(None,), ("May 19 22:03:29 h p: x",)], "raw string")
    rows = parse_syslog(df, "raw", BASE).orderBy("raw").collect()
    assert rows[0]["message"] is None or rows[1]["message"] is None


def test_plan_is_single_arrow_eval(spark):
    """One ArrowEvalPython node — the single process boundary (SURVEY §3.1)."""
    df = spark.createDataFrame([("x",)], "raw string")
    out = parse_syslog(df, "raw", BASE).select("program_name", "ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan


def test_unpinned_now_rejected(spark):
    df = spark.createDataFrame([("x",)], "raw string")
    with pytest.raises(ValueError, match="now_epoch"):
        parse_syslog(df, "raw", ParserOptions())
