"""Token codec: detokenize/retokenize round-trip invariant
(BASELINE.json input_hint: per-row token-array equality)."""

from __future__ import annotations

from pysyslog.tokens import detokenize, roundtrip_violations


def _tok(s: str):
    return list(s.encode("utf-8"))


def test_detokenize_and_roundtrip(spark):
    lines = [
        "May 19 22:03:29 janus sshd[10173]: session opened",
        "<163>Jul 26 15:50:14 h prog: unicode ü☃ payload",
        "",
    ]
    rows = [(f"d{i}", _tok(s), len(_tok(s)), "t") for i, s in enumerate(lines)]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )
    out = detokenize(df).orderBy("doc_id")
    got = [r["raw"] for r in out.collect()]
    assert got == lines
    assert roundtrip_violations(out).count() == 0


def test_roundtrip_catches_corruption(spark):
    df = spark.createDataFrame(
        [("d0", _tok("abc") + [120], "abc")],
        "doc_id string, tokens array<int>, raw string",
    )
    assert roundtrip_violations(df).count() == 1
