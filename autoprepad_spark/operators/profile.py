"""Single-pass table profiling — the engine's "fit" stage.

Every fit step of the reference is a global aggregation executed eagerly per
transformer (Tukey quantiles /root/reference/pipelines/preprocessing/
statistical/TukeyTransformer.py:36-42, MAD median MedianAbsolutDeviation.py:
40-45, Z mean/std ZTransformerMean.py:36-39, pruning stats runs.py:333-335).
Here they fuse into ONE wide aggregation over ONE scan:

* rollup("part") yields per-partition AND global stats in a single
  partial+final hash-agg (no second scan for the global row),
* quantiles use F.percentile (exact, for oracle parity at test scale) or
  F.percentile_approx (KLL-style mergeable sketch, the 100TB path),
* distinct counts use HyperLogLog (approx_count_distinct) — mergeable,
  constant memory per partition.

MAD needs the global median first, so it is a second (cheap, single-column)
pass; both passes prune to the columns they read, so the parquet scan reads
only (part, doc_id, source, n_tok) — never the heavy `tokens` column.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

GLOBAL_PART = "__all__"


@dataclass(frozen=True)
class ProfileStats:
    """Global fit statistics consumed by the marking pass."""

    n_rows: int
    mean_n_tok: float
    std_n_tok: float  # sample stddev, ddof=1 (ZTransformerMean.py:37 parity)
    q1_n_tok: float
    median_n_tok: float
    q3_n_tok: float
    mad_n_tok: float  # median(|x - median|), MedianAbsolutDeviation.py:41-42
    min_n_tok: float
    max_n_tok: float

    @property
    def tukey_bounds(self) -> tuple[float, float]:
        """Q1 - 1.5*IQR, Q3 + 1.5*IQR (TukeyTransformer.py:36-42, k=1.5)."""
        iqr = self.q3_n_tok - self.q1_n_tok
        return self.q1_n_tok - 1.5 * iqr, self.q3_n_tok + 1.5 * iqr


def profile(df: DataFrame, *, exact_quantiles: bool = True) -> DataFrame:
    """Per-partition + global profile in one aggregation pass.

    exact_quantiles=True uses F.percentile (matches numpy linear
    interpolation, needed for reference-parity tests); False uses the
    percentile_approx sketch — at 10^12 rows exact percentile sorts each
    group, the sketch is the only sane choice (document the tolerance).
    """
    pct = F.percentile if exact_quantiles else (
        lambda c, p: F.percentile_approx(c, p, 10_000)
    )
    q = pct(F.col("n_tok").cast("double"), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    agg = (
        df.rollup("part")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("n_tok").cast("long")).alias("sum_n_tok"),
            F.sum(F.isnull("doc_id").cast("long")).alias("n_null_doc_id"),
            F.sum(F.isnull("source").cast("long")).alias("n_null_source"),
            F.sum(F.isnull("n_tok").cast("long")).alias("n_null_n_tok"),
            F.approx_count_distinct("doc_id", 0.01).alias("approx_distinct_doc_id"),
            F.approx_count_distinct("source", 0.01).alias("approx_distinct_source"),
            F.min("n_tok").alias("min_n_tok"),
            F.max("n_tok").alias("max_n_tok"),
            F.avg("n_tok").alias("mean_n_tok"),
            F.stddev_samp("n_tok").alias("std_n_tok"),
            q.alias("q_n_tok"),
            F.grouping("part").alias("_g"),
        )
        .withColumn("part", F.when(F.col("_g") == 1, F.lit(GLOBAL_PART)).otherwise(F.col("part")))
        .drop("_g")
        .withColumn("q1_n_tok", F.col("q_n_tok")[0])
        .withColumn("median_n_tok", F.col("q_n_tok")[1])
        .withColumn("q3_n_tok", F.col("q_n_tok")[2])
        .drop("q_n_tok")
    )
    return agg


def global_stats(df: DataFrame, *, exact_quantiles: bool = True) -> ProfileStats:
    """Collect the global fit stats (profile row + the MAD second pass)."""
    prof = profile(df, exact_quantiles=exact_quantiles)
    rows = prof.filter(F.col("part") == GLOBAL_PART).collect()
    if not rows:  # empty input: rollup expands no grouping sets
        return ProfileStats(0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    row = rows[0]

    med = float(row["median_n_tok"]) if row["median_n_tok"] is not None else 0.0
    pct = F.percentile if exact_quantiles else (
        lambda c, p: F.percentile_approx(c, p, 10_000)
    )
    mad_row = df.select(
        pct(F.abs(F.col("n_tok").cast("double") - F.lit(med)), F.lit(0.5)).alias("mad")
    ).collect()[0]

    return ProfileStats(
        n_rows=int(row["n_rows"]),
        mean_n_tok=float(row["mean_n_tok"] or 0.0),
        std_n_tok=float(row["std_n_tok"] or 0.0),
        q1_n_tok=float(row["q1_n_tok"] or 0.0),
        median_n_tok=med,
        q3_n_tok=float(row["q3_n_tok"] or 0.0),
        mad_n_tok=float(mad_row["mad"] or 0.0),
        min_n_tok=float(row["min_n_tok"] or 0.0),
        max_n_tok=float(row["max_n_tok"] or 0.0),
    )
