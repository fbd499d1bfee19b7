"""Text analysis operators + multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pysyslog.multimodal import MEDIA_SCHEMA, extract_features, frame_sample_plan
from pysyslog.textops import (
    rolling_hash_udf,
    with_lang_id,
    with_md5_fingerprint,
    with_quality_score,
    with_token_stats,
)


def _docs(spark):
    rows = [
        (0, "the cat sat on the mat and it is warm"),
        (1, "der hund ist nicht mit der katze auf dem sofa"),
        (2, "le chat est sur la table pour le moment"),
        (3, "zzz qqq xxx"),
        (4, "x1 y2 z3 !!!"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_stats(spark):
    r = {x["doc_id"]: x for x in with_token_stats(_docs(spark)).collect()}
    assert r[0]["n_words"] == 10
    assert r[4]["n_words"] == 4
    assert r[4]["n_subwords"] == 9  # x,1,y,2,z,3,!,!,!
    assert r[0]["n_chars_m"] == len("the cat sat on the mat and it is warm")


def test_lang_id(spark):
    r = {x["doc_id"]: x["lang_pred"] for x in with_lang_id(_docs(spark)).collect()}
    assert r[0] == "en"
    assert r[1] == "de"
    assert r[2] == "fr"
    assert r[3] == "und"


def test_quality_score_ranges(spark):
    rows = with_quality_score(_docs(spark)).collect()
    for r in rows:
        assert 0.0 <= r["quality_score"] <= 1.0
    by_id = {r["doc_id"]: r["quality_score"] for r in rows}
    assert by_id[0] > by_id[3]  # stopword-rich English beats gibberish


def test_fingerprint_normalizes_whitespace(spark):
    df = spark.createDataFrame(
        [(0, "a  b\tc"), (1, " a b c ")], "doc_id long, text string"
    )
    fps = [r["fingerprint"] for r in with_md5_fingerprint(df).collect()]
    assert fps[0] == fps[1]


def test_rolling_hash_deterministic(spark):
    df = spark.createDataFrame(
        [(0, "abcdefghij"), (1, "abcdefghij"), (2, "different text")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["fp"] for r in
           df.select("doc_id", rolling_hash_udf()(F.col("text")).alias("fp")).collect()}
    assert out[0] == out[1]
    assert out[0] != out[2]


def test_rolling_hash_exact_values():
    """Exact closed-form values through the batch kernel — guards the
    numpy Mersenne-split math AND the Int64-setitem path (a plain
    pandas setitem of Python ints coerces through float64 and rounds
    hashes above 2^53; caught on the short-row branch in r5)."""
    import pandas as pd

    window, mod, base = 8, (1 << 61) - 1, 257

    def closed(s):
        if len(s) < window:
            h = 0
            for c in s:
                h = (h * base + ord(c)) % mod
            return h
        return min(
            sum(ord(s[i + j]) * pow(base, window - 1 - j, mod)
                for j in range(window)) % mod
            for i in range(len(s) - window + 1)
        )

    inner = rolling_hash_udf().func
    texts = ["", "ab", "a" * 7, "a" * 8, None, "日本語テスト1234567890",
             "x" * 9, "The quick brown fox jumps over the lazy dog"]
    got = inner(pd.Series(texts, dtype=object)).tolist()
    for t, g in zip(texts, got):
        if t is None:
            assert pd.isna(g)
        else:
            assert int(g) == closed(t), t


def test_multimodal_feature_extraction_fake(spark):
    rows = [
        ("m1", "image", bytearray(b"\x89PNG fake"), "image/png", 8, 8, None),
        ("m2", "image", bytearray(b"\x89PNG fake"), "image/png", 8, 8, None),
        ("m3", "audio", bytearray(b"RIFF fake"), "audio/wav", None, None, 1500),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in extract_features(df, fake=True).collect()}
    assert out["m1"]["feature"] == out["m2"]["feature"]  # deterministic
    assert out["m1"]["feature"] != out["m3"]["feature"]
    assert len(out["m1"]["feature"]) == 16
    assert out["m1"]["n_bytes"] == 9


def test_multimodal_real_decode_is_stubbed():
    from pysyslog.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"bytes")


def test_frame_sample_plan(spark):
    rows = [("v1", "video", bytearray(b"x"), "video/mp4", None, None, 3500)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    ts = [r["frame_ts_ms"] for r in frame_sample_plan(df).orderBy("frame_ts_ms").collect()]
    assert ts == [0, 1000, 2000]
