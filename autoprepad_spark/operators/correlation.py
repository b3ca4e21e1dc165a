"""Duplicate-column detection via rank correlation.

Reference parity: SpearmanCheck warns when |Spearman rho| >= 0.98 between
any numeric column pair (/root/reference/pipelines/preprocessing/
statistical/SpearmanCheck.py:23-34, scipy.spearmanr over O(k^2) pairs).

Spark-first: Spearman = Pearson on ranks. Ranks come from a window
(single ordering pass per column); the Pearson correlations of ALL pairs
are then computed in ONE aggregation from sufficient statistics
(sum x, sum y, sum xy, sum x^2, sum y^2, n) instead of k^2 separate
df.stat.corr jobs — one scan regardless of pair count.

Tie handling matches scipy: average ranks ((rank() + cume*n)/... ) via
the standard (rank + (count-1)/2) formulation using rank() and count()
over the tie group.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, Window as W, functions as F

SPEARMAN_WARN = 0.98  # SpearmanCheck.py:31


def _avg_rank(col: str):
    # average rank for ties: min_rank + (tie_count - 1)/2
    w = W.orderBy(F.col(col))
    tie = W.partitionBy(F.col(col))
    return F.rank().over(w) + (F.count(F.lit(1)).over(tie) - 1) / 2.0


def spearman_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col_a, col_b, rho) for every pair, one agg pass over ranked data.

    Scale note: rank() needs a total order per column — a global sort.
    For the validation engine this runs on PROFILE-SIZED samples or
    per-partition groups, not the raw 10^12-row table (same contract as
    the reference, which materializes the whole frame anyway).
    """
    ranked = df.select(
        *[_avg_rank(c).alias(f"r_{c}") for c in cols]
    )
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for c in cols:
        aggs.append(F.sum(f"r_{c}").alias(f"s_{c}"))
        aggs.append(F.sum(F.col(f"r_{c}") * F.col(f"r_{c}")).alias(f"ss_{c}"))
    for a, b in combinations(cols, 2):
        aggs.append(F.sum(F.col(f"r_{a}") * F.col(f"r_{b}")).alias(f"sp_{a}_{b}"))
    row = ranked.agg(*aggs).collect()[0]

    out = []
    n = row["n"]
    for a, b in combinations(cols, 2):
        cov = row[f"sp_{a}_{b}"] - row[f"s_{a}"] * row[f"s_{b}"] / n
        va = row[f"ss_{a}"] - row[f"s_{a}"] ** 2 / n
        vb = row[f"ss_{b}"] - row[f"s_{b}"] ** 2 / n
        rho = cov / (va * vb) ** 0.5 if va > 0 and vb > 0 else float("nan")
        out.append((a, b, float(rho)))
    return df.sparkSession.createDataFrame(out, "col_a string, col_b string, rho double")


def near_duplicate_columns(df: DataFrame, cols: list[str], threshold: float = SPEARMAN_WARN) -> DataFrame:
    m = spearman_matrix(df, cols)
    return m.filter(F.abs(F.col("rho")) >= threshold)
