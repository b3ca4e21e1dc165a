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

from pyspark.storagelevel import StorageLevel
from pyspark.sql import DataFrame, functions as F


def fit_vocabulary(df: DataFrame, col: str, *, max_vocab: int = 1_000_000) -> DataFrame:
    """(value, index) vocabulary, frequency-desc / value-asc order.

    The counting pass is a distributed hash agg; index assignment sorts
    the (value, count) pairs driver-side — deterministic at any
    parallelism, with no single-task global window in the plan. A fitted
    vocabulary must be broadcast-joinable to be applied at all, so the
    driver-side sort adds no new scale ceiling; ``max_vocab`` makes the
    assumption explicit (raise instead of silently OOMing the driver)."""
    hist = (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        # executor-side count guard, then collect from cache: exactly one
        # upstream execution (a LIMIT n+1 probe re-ran the scan in
        # CollectLimit's incremental waves under AQE)
        if hist.count() > max_vocab:
            raise ValueError(
                f"vocabulary for {col!r} exceeds max_vocab={max_vocab}; "
                "a high-cardinality column should use hashing, not an encoder"
            )
        counts = hist.collect()
    finally:
        hist.unpersist()
    ordered = sorted(counts, key=lambda r: (-r["_cnt"], r[col]))
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("value", df.schema[col].dataType),
            T.StructField("index", T.IntegerType()),
        ]
    )
    return df.sparkSession.createDataFrame(
        [(r[col], i) for i, r in enumerate(ordered)], schema
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

    When ``n_bits`` is supplied no Spark action runs here (the width is
    taken on trust for plan building) — but the decomposition still
    guards against silent truncation: any index too wide for ``n_bits``
    raises at execution time instead of colliding with a narrower code.
    """
    if n_bits is None:
        k = vocab.count()
        b = max(1, math.ceil(math.log2(k + 1)))
    else:
        b = n_bits
    out = ordinal_encode(df, col, vocab, unknown_value=-1)
    code = F.col(f"{col}_ord") + F.lit(1)  # -1 (unknown) -> 0
    # execution-time truncation guard: raise rather than collide codes
    code = F.when(
        code >= F.lit(1 << b),
        F.raise_error(
            F.lit(f"binary_encode: vocabulary index overflows n_bits={b} for {col!r}")
        ).cast("int"),
    ).otherwise(code)
    for i in range(b):
        out = out.withColumn(
            f"{col}_bin_{i}",
            F.shiftright(code, b - 1 - i).bitwiseAND(F.lit(1)).cast("int"),
        )
    return out.drop(f"{col}_ord")
