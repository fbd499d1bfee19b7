"""Text-analysis operators for training-data pipelines.

All hot paths are built-in pyspark.sql.functions expressions (JVM-side,
whole-stage codegen); Python appears only in the optional rolling-hash
fingerprint (Arrow-batched pandas UDF).  Every SQL-expressible operator
has a matching DuckDB oracle in __spark_entry__.py.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

# Tiny per-language stopword sets for the n-gram/stopword language
# heuristic.  Deliberately small: the heuristic must be cheap and
# SQL-expressible, not a real language model.
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des", "pour", "que"),
}


def _words(col: Column) -> Column:
    return F.split(F.trim(F.lower(col)), r"\s+")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword count estimate.

    `n_subwords` counts maximal runs of letters / digits / single other
    symbols — the shape of a byte-BPE pre-tokenizer split — via one
    JVM-side regexp; good enough for budgeting token counts at scale.
    """
    c = F.col(text_col)
    return (
        df.withColumn("n_words", F.size(_words(c)))
        .withColumn(
            "n_subwords",
            F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)),
        )
        .withColumn("n_chars_m", F.length(c))
    )


def stopword_hits(col: Column, lang: str = "en") -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(_words(col), lambda w: w.isin(*words)))


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Cheap quality heuristics: length, alpha ratio, stopword ratio,
    mean word length — combined into a 0..1 score.  All built-in
    expressions; formula mirrored exactly in the DuckDB oracle."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_words = F.size(_words(c))
    alpha_ratio = F.length(F.regexp_replace(c, r"[^A-Za-z]", "")) / F.greatest(
        n_chars, F.lit(1)
    )
    stop_ratio = stopword_hits(c) / F.greatest(n_words, F.lit(1))
    mean_word_len = n_chars / F.greatest(n_words, F.lit(1))
    score = (
        F.least(n_words / F.lit(50.0), F.lit(1.0)) * 0.25
        + alpha_ratio * 0.25
        + F.least(stop_ratio * F.lit(4.0), F.lit(1.0)) * 0.25
        + F.when((mean_word_len >= 3) & (mean_word_len <= 12), 0.25).otherwise(0.0)
    )
    return (
        df.withColumn("alpha_ratio", F.round(alpha_ratio, 6))
        .withColumn("stop_ratio", F.round(stop_ratio, 6))
        .withColumn("quality_score", F.round(score, 6))
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID over the supported set ('en' wins
    ties, then 'de', then 'fr'; 'und' = undetermined when no hits)."""
    c = F.col(text_col)
    en, de, fr = (stopword_hits(c, l) for l in ("en", "de", "fr"))
    return (
        df.withColumn("lang_hits_en", en)
        .withColumn("lang_hits_de", de)
        .withColumn("lang_hits_fr", fr)
        .withColumn(
            "lang_pred",
            F.when((en == 0) & (de == 0) & (fr == 0), "und")
            .when((en >= de) & (en >= fr), "en")
            .when(de >= fr, "de")
            .otherwise("fr"),
        )
    )


def with_md5_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace-normalized md5 document fingerprint (JVM-side)."""
    norm = F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
    return df.withColumn("fingerprint", F.md5(norm))


def rolling_hash_udf(window: int = 8, mod: int = (1 << 61) - 1, base: int = 257):
    """Winnowing-style rolling-hash fingerprint (min polynomial hash
    over all `window`-grams) as an Arrow-batched pandas UDF.  The hash
    runs over CODE POINTS (not utf-8 bytes): each window's value is the
    closed-form Σ cp[i+j]·base^(w-1-j) mod p, which DuckDB replays with
    ord(substr(...)) in HUGEINT — making this operator oracle-gated.
    The rolling O(1) update below is the per-row fast path; per-char
    Python is inherent to winnowing."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    def fp(s: str) -> int | None:
        if s is None:
            return None
        cps = [ord(c) for c in s]
        if len(cps) < window:
            h = 0
            for v in cps:
                h = (h * base + v) % mod
            return h
        h = 0
        pw = pow(base, window - 1, mod)
        best = None
        for i, v in enumerate(cps):
            if i >= window:
                h = (h - cps[i - window] * pw) % mod
            h = (h * base + v) % mod
            if i >= window - 1:
                best = h if best is None or h < best else best
        return best

    @pandas_udf(LongType())
    def roll(texts: pd.Series) -> pd.Series:
        return texts.map(fp).astype("Int64")

    return roll
