"""Token-array ⇄ raw-line codec (BASELINE.json input_hint).

The pipeline input is an Iceberg/parquet table of pre-tokenized lines:
(doc_id string, tokens array<int32>, n_tok int32, source string) where
tokens are the UTF-8 byte values of the raw syslog line.  These are
Arrow-vectorized pandas UDFs (never per-row Python UDFs); the per-row
invariant is exact round-trip equality: retokenize(detokenize(t)) == t.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType


def _detok_series(tokens):
    import numpy as np

    def one(a):
        if a is None:
            return None
        return np.asarray(a, dtype=np.uint8).tobytes().decode("utf-8", "strict")

    return tokens.map(one)


def _retok_series(lines):
    import numpy as np

    def one(s):
        if s is None:
            return None
        return np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype("int32")

    return lines.map(one)


def detokenize_udf():
    from pyspark.sql.functions import pandas_udf

    return pandas_udf(_detok_series, StringType())


def retokenize_udf():
    from pyspark.sql.functions import pandas_udf

    return pandas_udf(_retok_series, ArrayType(IntegerType()))


def detokenize(df, tokens_col: str = "tokens", out_col: str = "raw"):
    """tokens array<int32> -> raw line string column."""
    return df.withColumn(out_col, detokenize_udf()(F.col(tokens_col)))


def retokenize(df, raw_col: str = "raw", out_col: str = "tokens_rt"):
    """raw line string -> tokens array<int32> (round-trip verification)."""
    return df.withColumn(out_col, retokenize_udf()(F.col(raw_col)))


def roundtrip_violations(df, tokens_col: str = "tokens", raw_col: str = "raw"):
    """DataFrame of rows violating the token-array equality invariant.
    The comparison itself is a JVM-side array equality (no shuffle)."""
    rt = retokenize(df, raw_col=raw_col, out_col="__tokens_rt")
    return rt.filter(~(F.col(tokens_col) == F.col("__tokens_rt"))).drop("__tokens_rt")
