"""Robust-statistics expression builders — generalized over any numeric
column (the engine's n_tok checks are one instantiation).

Reference formulas reproduced exactly:
* Tukey fences: Q1 - k*IQR / Q3 + k*IQR, k=1.5
  (/root/reference/pipelines/preprocessing/statistical/TukeyTransformer.py:33-42)
* modified Z: 0.6745*(x - median)/MAD, flag |z| > 3.5
  (MedianAbsolutDeviation.py:36-61)
* Z score: (x - mean)/std(ddof=1), flag |z| > 3 (ZTransformerMean.py:32-58)
* MinMax rescale of scores (pipelines/runs.py:200-201)
* Robust scale (x - median)/IQR (pipelines/configuration.py:192-194)
* top-k% percentile labeling (pipelines/runs.py:211-214)
* percentile sweep 1..100 for PR curves (experiment.py:394-405)

Each `fit_*` is ONE aggregation (partial+final, sketch-compatible);
each `*_flag`/`*_scale` is a pure Column expression (whole-stage codegen).
Zero-spread guards: constant columns never flag (MAD==0 -> 0, std==0 -> 0).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

TUKEY_K = 1.5
MAD_SCALE = 0.6745
MAD_THRESHOLD = 3.5
Z_THRESHOLD = 3.0


def _pct(col: Column, probs, exact: bool):
    if exact:
        return F.percentile(col, probs)
    return F.percentile_approx(col, probs, 10_000)


@dataclass(frozen=True)
class RobustStats:
    mean: float
    std: float  # ddof=1
    q1: float
    median: float
    q3: float
    mad: float
    vmin: float
    vmax: float

    @property
    def iqr(self) -> float:
        return self.q3 - self.q1

    @property
    def tukey_lo(self) -> float:
        return self.q1 - TUKEY_K * self.iqr

    @property
    def tukey_hi(self) -> float:
        return self.q3 + TUKEY_K * self.iqr


def fit_robust(df: DataFrame, col: str, *, exact: bool = True) -> RobustStats:
    """All univariate fit statistics in one agg + the MAD second pass."""
    c = F.col(col).cast("double")
    row = df.agg(
        F.avg(c).alias("mean"),
        F.stddev_samp(c).alias("std"),
        _pct(c, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), exact).alias("q"),
        F.min(c).alias("vmin"),
        F.max(c).alias("vmax"),
    ).collect()[0]
    med = float(row["q"][1]) if row["q"] else 0.0
    mad_row = df.agg(_pct(F.abs(c - F.lit(med)), F.lit(0.5), exact).alias("mad")).collect()[0]
    return RobustStats(
        mean=float(row["mean"] or 0.0),
        std=float(row["std"] or 0.0),
        q1=float(row["q"][0]) if row["q"] else 0.0,
        median=med,
        q3=float(row["q"][2]) if row["q"] else 0.0,
        mad=float(mad_row["mad"] or 0.0),
        vmin=float(row["vmin"] or 0.0),
        vmax=float(row["vmax"] or 0.0),
    )


def tukey_flag(col: Column, stats: RobustStats) -> Column:
    return ((col < stats.tukey_lo) | (col > stats.tukey_hi)).cast("int")


def mad_flag(col: Column, stats: RobustStats) -> Column:
    if stats.mad <= 0:
        return F.lit(0)
    z = MAD_SCALE * (col - stats.median) / stats.mad
    return (F.abs(z) > MAD_THRESHOLD).cast("int")


def zscore_flag(col: Column, stats: RobustStats) -> Column:
    if stats.std <= 0:
        return F.lit(0)
    return (F.abs((col - stats.mean) / stats.std) > Z_THRESHOLD).cast("int")


def flag_total(*flags: Column) -> Column:
    """Row-wise horizontal sum of 0/1 flags (TukeyTransformerTotal.py:25-36)."""
    total = flags[0]
    for f in flags[1:]:
        total = total + f
    return total.cast("int")


def minmax_scale(col: Column, vmin: float, vmax: float) -> Column:
    if vmax == vmin:
        return F.lit(0.0)
    return (col - vmin) / (vmax - vmin)


def robust_scale(col: Column, stats: RobustStats) -> Column:
    if stats.iqr == 0:
        return F.lit(0.0)
    return (col - stats.median) / stats.iqr


def percentile_threshold(df: DataFrame, col: str, pct: float = 0.9, *, exact: bool = True) -> float:
    """Threshold for top-(1-pct) labeling (runs.py:211-214, default top 10%)."""
    c = F.col(col).cast("double")
    return float(df.agg(_pct(c, F.lit(pct), exact).alias("t")).collect()[0]["t"])


def percentile_sweep(df: DataFrame, col: str, *, exact: bool = True) -> DataFrame:
    """(pct 1..100, value) in ONE aggregation (experiment.py:394-405 ran 100
    separate np.percentile calls; here a single percentile array + explode)."""
    c = F.col(col).cast("double")
    probs = F.array(*[F.lit(i / 100.0) for i in range(1, 101)])
    agg = df.agg(_pct(c, probs, exact).alias("vals"))
    return agg.select(
        F.posexplode("vals").alias("idx", "value")
    ).select((F.col("idx") + 1).alias("pct"), "value")


def variance_report(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column stddev + null count + drop decision, one wide agg pass.

    Reference parity: remove_no_variance_columns drops columns with
    std()==0.0 OR containing any NaN after transform
    (/root/reference/pipelines/runs.py:310-365, std at 333, isna at 335).
    """
    aggs = []
    for c in cols:
        aggs.append(F.stddev_samp(F.col(c).cast("double")).alias(f"_s_{c}"))
        aggs.append(F.sum(F.isnull(c).cast("long")).alias(f"_n_{c}"))
    row = df.agg(*aggs).collect()[0]
    out = []
    for c in cols:
        s, n = row[f"_s_{c}"], int(row[f"_n_{c}"])
        dropped = (s is None or float(s) == 0.0) or n > 0
        out.append((c, float(s) if s is not None else None, n, dropped))
    return df.sparkSession.createDataFrame(
        out, "column string, stddev double, n_null long, dropped boolean"
    )


def prune_no_variance(
    df: DataFrame, cols: list[str], *, protect: tuple[str, ...] = ()
) -> DataFrame:
    """Drop no-variance / any-null columns (runs.py:310-365); `protect`
    mirrors the experiment variant that preserves MAD_Total/Tukey_Total
    (experiment.py:551-559)."""
    rep = variance_report(df, [c for c in cols if c not in protect])
    to_drop = [r["column"] for r in rep.collect() if r["dropped"]]
    return df.drop(*to_drop)


def fit_robust_multi(
    df: DataFrame, cols: list[str], *, exact: bool = True
) -> dict[str, RobustStats]:
    """Fit statistics for MANY columns in two scans total (one wide agg
    for mean/std/quantiles/min/max across all columns, one for the MADs)
    — the reference fits each transformer eagerly per column
    (pipelines/runs.py:139), which at scale means 2 scans per column;
    here the passes are fused."""
    aggs = []
    for c in cols:
        cc = F.col(c).cast("double")
        aggs += [
            F.avg(cc).alias(f"mean_{c}"),
            F.stddev_samp(cc).alias(f"std_{c}"),
            _pct(cc, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), exact).alias(f"q_{c}"),
            F.min(cc).alias(f"min_{c}"),
            F.max(cc).alias(f"max_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]
    meds = {c: float(row[f"q_{c}"][1]) if row[f"q_{c}"] else 0.0 for c in cols}
    mad_row = df.agg(
        *[
            _pct(F.abs(F.col(c).cast("double") - F.lit(meds[c])), F.lit(0.5), exact).alias(f"mad_{c}")
            for c in cols
        ]
    ).collect()[0]
    out = {}
    for c in cols:
        q = row[f"q_{c}"]
        out[c] = RobustStats(
            mean=float(row[f"mean_{c}"] or 0.0),
            std=float(row[f"std_{c}"] or 0.0),
            q1=float(q[0]) if q else 0.0,
            median=meds[c],
            q3=float(q[2]) if q else 0.0,
            mad=float(mad_row[f"mad_{c}"] or 0.0),
            vmin=float(row[f"min_{c}"] or 0.0),
            vmax=float(row[f"max_{c}"] or 0.0),
        )
    return out
