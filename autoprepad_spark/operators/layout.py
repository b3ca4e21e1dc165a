"""Data-layout operators: multi-column Z-order clustering for scan
locality, plus the key-skew profile that sizes salting decisions.

No reference counterpart (AutoPrepAD is single-node pandas with no
storage layout); this is the table-maintenance side of the engine the
same way sources/compaction.py is — at 100 TB the dominant cost of a
selective query is how many files its predicates touch, and a
Z-order rewrite is how Iceberg/Delta make multi-predicate min/max
pruning effective on more than the leading sort column.

Everything is integer Column arithmetic (whole-stage codegen): the
Z-value is exactly recomputable by any engine, the clustering pass is
ONE range-partitioning shuffle + an in-partition sort — the identical
physical shape `df.repartitionByRange(...).sortWithinPartitions(...)`
Iceberg's own rewrite action plans.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def column_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """(min, max) per column in ONE wide aggregation pass (mergeable
    partials, no shuffle of rows — the same division of labor as every
    fit in this engine). Nulls ignored by min/max; an all-null column
    gets (0, 0) and quantizes to bucket 0."""
    aggs = []
    for c in cols:
        # try_cast: under ANSI mode (Spark 4 default) a plain cast of a
        # non-numeric string THROWS mid-aggregation; null-on-failure
        # routes such columns to the degenerate-bounds guard instead
        aggs.append(F.min(F.col(c).try_cast("double")).alias(f"_mn_{c}"))
        aggs.append(F.max(F.col(c).try_cast("double")).alias(f"_mx_{c}"))
    row = df.agg(*aggs).collect()[0]
    out = {}
    for c in cols:
        mn, mx = row[f"_mn_{c}"], row[f"_mx_{c}"]
        out[c] = (float(mn) if mn is not None else 0.0,
                  float(mx) if mx is not None else 0.0)
    return out


def _quantize(col: str, lo: float, hi: float, bits: int) -> Column:
    """Linear quantization to [0, 2^bits - 1] as exact integer math:
    floor((x - lo) * scale), clamped; nulls land in bucket 0 (they sort
    first, same as a NULLS FIRST layout). Constant columns -> bucket 0."""
    buckets = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    scale = buckets / (hi - lo)
    # try_cast for the same ANSI reason as column_bounds: a stray
    # non-numeric value becomes bucket 0, not a job-killing exception
    q = F.floor((F.col(col).try_cast("double") - F.lit(lo)) * F.lit(scale))
    q = F.least(F.lit(buckets).cast("long"), F.greatest(F.lit(0).cast("long"), q.cast("long")))
    return F.coalesce(q, F.lit(0).cast("long"))


def zorder_key(
    cols: list[str],
    bounds: dict[str, tuple[float, float]],
    *,
    bits: int = 8,
) -> Column:
    """Morton/Z-value of the quantized columns: bit j of column i lands
    at position j*k + i, so every column contributes to the HIGH bits of
    the key — a range of Z-values is a bounded set of hyper-rectangles
    in every dimension, which is what makes min/max pruning work for
    non-leading predicates (a plain compound sort only helps the first
    column). Pure shift/and/or integer expressions; k * bits must fit a
    long (<= 62)."""
    k = len(cols)
    if k < 1:
        raise ValueError("zorder_key needs at least one column")
    if k * bits > 62:
        raise ValueError(
            f"{k} cols x {bits} bits = {k * bits} interleaved bits "
            "exceeds a long; lower bits or column count"
        )
    qs = [_quantize(c, *bounds[c], bits) for c in cols]
    z = F.lit(0).cast("long")
    for j in range(bits):
        for i, q in enumerate(qs):
            bit = F.shiftright(q, j).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(
                F.shiftleft(bit, j * k + i)
            )
    return z


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 8,
    num_partitions: int,
    bounds: dict[str, tuple[float, float]] | None = None,
    keep_key: bool = False,
) -> DataFrame:
    """Rewrite a table into Z-order: ONE repartitionByRange shuffle on
    the Z-value (range boundaries from Spark's reservoir sample — the
    same mechanism as a global orderBy, but into num_partitions output
    files) + an in-partition sort, so every output file covers a tight
    Z-range and therefore a tight min/max envelope in EVERY clustered
    column. Write the result with the usual sized-file sink
    (sources/compaction.py) and selective scans prune files on any of
    the clustered predicates, not just the leading one."""
    if bounds is None:
        bounds = column_bounds(df, cols)
    degenerate = [c for c in cols if bounds[c][1] <= bounds[c][0]]
    if len(degenerate) == len(cols):
        # every column quantizes to bucket 0 -> the key is a constant ->
        # repartitionByRange collapses to ONE partition and one task
        # writes the whole dataset; fail loudly instead (non-numeric
        # columns cast to all-null bounds and land here too)
        raise ValueError(
            f"cluster_by_zorder: every clustering column {degenerate} has "
            "degenerate (constant, all-null, or non-numeric) bounds — the "
            "Z-key would be a single constant. Cluster on columns with "
            "numeric spread, or hash a string column to a numeric first."
        )
    z = zorder_key(cols, bounds, bits=bits)
    out = (
        df.withColumn("_zkey", z)
        .repartitionByRange(num_partitions, "_zkey")
        .sortWithinPartitions("_zkey")
    )
    return out if keep_key else out.drop("_zkey")


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    *,
    top: int = 10,
    target_partitions: int | None = None,
) -> DataFrame:
    """Heavy-key diagnostic that SIZES the engine's salting knobs: one
    map-side-combined groupBy(key).count(), then a bounded top-k by
    count plus a summary row. Long-form output
    (kind, rank, key, cnt, share, suggested_salt):

    * kind='key'    — the top-N heaviest keys (rank 1..N);
    * kind='summary'— rank 0, key NULL, cnt = total rows, share =
      max_share, suggested_salt = ceil(max_cnt / (total /
      target_partitions)) — the salt factor at which the heaviest key's
      largest salted shard is no bigger than an average partition,
      i.e. exactly the number the salted-uniqueness / salted-agg paths
      (operators/uniqueness.py) take as their fan-out.

    The shuffle carries one row per DISTINCT key (map-side combined),
    the top-k cut is a distributed orderBy(limit) — nothing row-scale
    reaches the driver, so this runs at full-corpus scale as a cheap
    pre-flight before a big keyed job. The per-key counts are
    localCheckpoint-ed before the stats pass, so the corpus is scanned
    and shuffled ONCE: the returned DataFrame's execution reads the
    materialized counts, not the input again."""
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    ).localCheckpoint()
    stats = counts.agg(
        F.sum("cnt").alias("total"),
        F.max("cnt").alias("max_cnt"),
        F.count(F.lit(1)).alias("n_keys"),
    ).collect()[0]
    total, max_cnt = int(stats["total"] or 0), int(stats["max_cnt"] or 0)
    tp = target_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    avg_per_part = max(total / int(tp), 1.0)
    suggested = math.ceil(max_cnt / avg_per_part) if total else 0
    topk = (
        counts.orderBy(F.desc("cnt"), F.asc("key"))
        .limit(top)
        .select(
            F.lit("key").alias("kind"),
            F.row_number()
            .over(W.orderBy(F.desc("cnt"), F.asc("key")))
            .alias("rank"),
            "key",
            "cnt",
            (F.col("cnt") / F.lit(float(total or 1))).alias("share"),
            F.lit(suggested).alias("suggested_salt"),
        )
    )
    summary = df.sparkSession.createDataFrame(
        [
            (
                "summary",
                0,
                None,
                total,
                (max_cnt / total) if total else 0.0,
                suggested,
            )
        ],
        "kind string, rank int, key string, cnt long, share double, "
        "suggested_salt int",
    )
    return summary.unionByName(topk)
