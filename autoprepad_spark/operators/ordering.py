"""Deterministic global shuffle + sharding — the training-export step.

No reference counterpart (AutoPrepAD returns a severity-sorted pandas
frame, pipelines/runs.py:435; training pipelines need the opposite — a
reproducible RANDOM order at 100-TB scale). Both operators derive every
decision from a seeded 64-bit hash of the row key, so results are
independent of input partitioning, cluster size, and task scheduling:

* ``assign_shards`` — bit-stable shard MEMBERSHIP via pmod(xxhash64):
  a narrow projected column, no shuffle of its own; write with
  ``.partitionBy("shard")`` or feed a repartition on it.
* ``training_order`` — a total deterministic pseudo-random ORDER via
  repartitionByRange + sortWithinPartitions on the hash: one range
  shuffle, each output partition sorts locally (external sort, spills),
  no single-node bottleneck. Range BOUNDARIES come from Spark's
  reservoir sampling, so shard sizes are approximately-equal rather
  than bit-stable — the contract here is the ORDER (the concatenation
  of output partitions in partition order is the same total order by
  shuffle key on every run); when byte-identical shard membership
  matters more than balance, use ``assign_shards`` instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: shuffle-key column added by training_order
ORDER_COL = "_shuffle_ord"


def shuffle_key(key_col: str, seed: int = 0) -> Column:
    """Seeded 64-bit hash of the row key — the source of all randomness
    here (xxhash64 is uniform; distinct seeds give independent orders)."""
    return F.xxhash64(F.col(key_col).cast("string"), F.lit(int(seed)))


def assign_shards(
    df: DataFrame,
    n_shards: int,
    *,
    key_col: str = "doc_id",
    seed: int = 0,
    shard_col: str = "shard",
) -> DataFrame:
    """Add a deterministic uniform shard id in [0, n_shards): a pure
    projection (pmod of the seeded key hash) — membership is bit-stable
    across parallelism, reruns, and engines."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return df.withColumn(
        shard_col, F.pmod(shuffle_key(key_col, seed), F.lit(n_shards)).cast("int")
    )


def training_order(
    df: DataFrame,
    n_shards: int,
    *,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Globally shuffle the corpus into a reproducible pseudo-random
    total order across ``n_shards`` output partitions (see module
    docstring for the order-vs-boundaries contract). The added
    ``_shuffle_ord`` column is retained so downstream writers/readers
    can re-assert or resume the order."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return (
        df.withColumn(ORDER_COL, shuffle_key(key_col, seed))
        .repartitionByRange(n_shards, ORDER_COL)
        .sortWithinPartitions(ORDER_COL)
    )
