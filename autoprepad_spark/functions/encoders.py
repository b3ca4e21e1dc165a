"""Categorical encoders — the reference's feature-encoding surface
re-expressed as deterministic DataFrame ops.

Reference parity:
* OrdinalEncoder: category -> ordinal int, unknown -> -1
  (/root/reference/pipelines/configuration.py:536-543,
  handle_unknown="use_encoded_value", unknown_value=-1)
* BinaryEncoder: category -> ceil(log2 k) 0/1 columns — chosen by the
  reference over one-hot "for Big Data and Performance"
  (/root/reference/pipelines/configuration.py:291-294, README.md:63-68)

Design: the fitted "vocabulary" is a small DataFrame (category ->
index), index assigned by frequency-desc then value-asc — deterministic
at any parallelism (no StringIndexer RDD ordering dependence). Applying
is a broadcast hash join; the binary decomposition is pure bit
arithmetic on the joined index (shiftright & 1), so k categories cost
ceil(log2 k) narrow int columns, never k.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window as W, functions as F


def fit_vocabulary(df: DataFrame, col: str) -> DataFrame:
    """(value, index) vocabulary, frequency-desc / value-asc order."""
    counts = df.filter(F.col(col).isNotNull()).groupBy(col).agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    w = W.orderBy(F.desc("_cnt"), F.asc(col))
    return counts.select(
        F.col(col).alias("value"),
        (F.row_number().over(w) - 1).cast("int").alias("index"),
    )


def ordinal_encode(
    df: DataFrame, col: str, vocab: DataFrame, *, unknown_value: int = -1
) -> DataFrame:
    """Append ``<col>_ord``; unseen/null categories -> unknown_value."""
    v = vocab.select(
        F.col("value").alias(col), F.col("index").alias(f"{col}_ord")
    )
    out = df.join(F.broadcast(v), col, "left")
    return out.withColumn(
        f"{col}_ord",
        F.coalesce(F.col(f"{col}_ord"), F.lit(unknown_value)).cast("int"),
    )


def binary_encode(
    df: DataFrame, col: str, vocab: DataFrame, *, n_bits: int | None = None
) -> DataFrame:
    """Append ``<col>_bin_0`` .. ``<col>_bin_{b-1}`` (b = ceil(log2 k)).

    Bit columns decompose (ordinal index + 1); unknowns encode as index 0
    = all-zero bits, mirroring category_encoders.BinaryEncoder's
    1-based codes with 0 reserved for unknown.
    """
    k = vocab.count()
    b = n_bits or max(1, math.ceil(math.log2(k + 1)))
    out = ordinal_encode(df, col, vocab, unknown_value=-1)
    code = F.col(f"{col}_ord") + F.lit(1)  # -1 (unknown) -> 0
    for i in range(b):
        out = out.withColumn(
            f"{col}_bin_{i}",
            F.shiftright(code, b - 1 - i).bitwiseAND(F.lit(1)).cast("int"),
        )
    return out.drop(f"{col}_ord")
