"""Mergeable unbounded-domain summaries (functions/summaries.py):

- rank summary: exact hist-fit parity below capacity, certified rank
  error above it, merge == rebuild, parallelism-independence, nulls
- frequency summary: exact top-k below cap with dec==0, certified
  lower/upper count bracket above cap, merge across shards
- plan shape: the scan side has NO Exchange (summaries build per
  partition; only the kilobyte summary frame ever shuffles)
"""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from autoprepad_spark.functions.stats import fit_robust_multi
from autoprepad_spark.functions.summaries import (
    fit_from_summary,
    freq_summary,
    merge_freq_summaries,
    merge_summaries,
    quantile_summary,
    summary_null_counts,
    topk_from_summary,
)


@pytest.fixture(scope="module")
def cont_df(spark):
    """200k-row continuous (lognormal-ish) column, deterministic, with
    nulls — the domain the hist fit cannot bound."""
    n = 200_000
    df = spark.range(n).select(
        F.col("id"),
        F.when(
            F.col("id") % 97 == 0, F.lit(None).cast("double")
        ).otherwise(
            F.exp(F.sin(F.col("id") * 0.7) * 3.0 + (F.col("id") % 1013) / 101.3)
        ).alias("x"),
    )
    return df.repartition(8).persist()


def _expected(cont_df):
    pdf = cont_df.select("x").toPandas()
    vals = pdf["x"].dropna().to_numpy(dtype=np.float64)
    return pdf, np.sort(vals)


def test_exact_below_capacity_matches_hist_fit(spark):
    df = spark.range(5_000).select(
        (F.col("id") % 37 * 1.5 - (F.col("id") % 11)).alias("a"),
        F.when(F.col("id") % 5 == 0, None).otherwise(F.col("id") % 13).alias("b"),
    ).repartition(6)
    fit = fit_from_summary(quantile_summary(df, ["a", "b"], m=5000))
    hist = fit_robust_multi(df, ["a", "b"])
    for c in ("a", "b"):
        got, want = fit[c], hist[c]
        # quantile family is bit-exact (same weighted_quantiles on the
        # same histogram); moments are float-order-sensitive
        assert (got.q1, got.median, got.q3, got.mad, got.vmin, got.vmax) == (
            want.q1,
            want.median,
            want.q3,
            want.mad,
            want.vmin,
            want.vmax,
        )
        assert got.mean == pytest.approx(want.mean, rel=1e-12)
        assert got.std == pytest.approx(want.std, rel=1e-9)


def test_rank_error_bound_above_capacity(cont_df):
    m = 256
    n_parts = cont_df.rdd.getNumPartitions()
    fit = fit_from_summary(quantile_summary(cont_df, ["x"], m=m))["x"]
    _, svals = _expected(cont_df)
    n = svals.size
    # worst-case certified bound: sum_p ceil(n_p/m) <= n/m + P
    bound = n / m + n_parts + 1
    for q, est in ((0.25, fit.q1), (0.5, fit.median), (0.75, fit.q3)):
        rank_est = np.searchsorted(svals, est, side="left")
        assert abs(rank_est - q * n) <= bound, (q, est)
    # moments exact regardless of capacity
    assert fit.mean == pytest.approx(float(svals.mean()), rel=1e-12)
    assert fit.std == pytest.approx(float(svals.std(ddof=1)), rel=1e-9)
    assert fit.vmin == svals[0] and fit.vmax == svals[-1]


def test_merge_equals_rebuild_and_parallelism_independence(spark):
    df = spark.range(9_000).select(
        (F.col("id") % 401 * 0.25).alias("a"), F.col("id")
    )
    shards = [
        df.filter(F.col("id") % 3 == i).repartition(2 + i) for i in range(3)
    ]
    merged = merge_summaries(
        *[quantile_summary(s, ["a"], m=4000) for s in shards]
    )
    fit_merged = fit_from_summary(merged)["a"]
    fit_one = fit_from_summary(quantile_summary(df.coalesce(1), ["a"], m=9001))["a"]
    fit_many = fit_from_summary(
        quantile_summary(df.repartition(13), ["a"], m=9001)
    )["a"]
    for got in (fit_merged, fit_one):
        assert (got.q1, got.median, got.q3, got.mad, got.vmin, got.vmax) == (
            fit_many.q1,
            fit_many.median,
            fit_many.q3,
            fit_many.mad,
            fit_many.vmin,
            fit_many.vmax,
        )
        assert got.mean == pytest.approx(fit_many.mean, rel=1e-12)


def test_null_counts_ride_the_summary(cont_df):
    row = summary_null_counts(quantile_summary(cont_df, ["x"], m=64)).collect()[0]
    pdf = cont_df.select("x").toPandas()
    assert row["n_null"] == int(pdf["x"].isna().sum())
    assert row["n_rows"] == int(pdf["x"].notna().sum())


def test_empty_and_all_null_columns(spark):
    df = spark.range(100).select(F.lit(None).cast("double").alias("z"))
    fit = fit_from_summary(quantile_summary(df, ["z"], m=64))["z"]
    assert fit.median == 0.0 and fit.mean == 0.0
    row = summary_null_counts(quantile_summary(df, ["z"], m=64)).collect()[0]
    assert row["n_null"] == 100 and row["n_rows"] == 0


def test_fit_guard_raises_on_unbounded_cells(spark):
    df = spark.range(50_000).select((F.col("id") * 1.0).alias("a"))
    with pytest.raises(ValueError, match="cells"):
        fit_from_summary(
            quantile_summary(df.repartition(4), ["a"], m=50_000), max_cells=1_000
        )


def test_no_exchange_on_the_scan_side(spark):
    df = spark.range(10_000).select((F.col("id") % 7 * 1.0).alias("a"))
    plan = quantile_summary(df, ["a"], m=64)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # summary build is partition-local


# ---------------------------------------------------------------------------
# frequency summary
# ---------------------------------------------------------------------------


def test_freq_exact_below_cap(spark):
    df = spark.range(30_000).select(
        (F.col("id") % 977).cast("string").alias("k")
    ).repartition(6)
    tk = topk_from_summary(freq_summary(df, ["k"], cap=2000), k=10).toPandas()
    assert (tk["max_undercount"] == 0).all()
    truth = (
        df.toPandas()["k"].value_counts().sort_values(ascending=False)
    )
    # deterministic tiebreak: count desc, item asc (string order)
    want = sorted(
        truth.items(), key=lambda t: (-t[1], t[0])
    )[:10]
    got = sorted(
        zip(tk["item"], tk["count_lo"]), key=lambda t: (-t[1], t[0])
    )
    assert got == [(k, int(v)) for k, v in want]


def test_freq_certified_bracket_above_cap(spark):
    # zipf-ish: heavy head + long tail, far above cap
    df = spark.range(60_000).select(
        F.when(F.col("id") % 3 == 0, (F.col("id") % 7))
        .otherwise(F.col("id") % 9973)
        .cast("string")
        .alias("k")
    ).repartition(4)
    summ = freq_summary(df, ["k"], cap=50)
    tk = topk_from_summary(summ, k=20).toPandas()
    dec = int(tk["max_undercount"].iloc[0])
    assert dec > 0
    truth = df.toPandas()["k"].value_counts()
    for item, lo in zip(tk["item"], tk["count_lo"]):
        true = int(truth[item])
        assert lo <= true <= lo + dec, (item, lo, true, dec)
    # MG guarantee: every item with true count > dec is in SOME summary
    # cell; the heavy head (count >> dec) must appear in the top-k
    head = {str(i) for i in range(7)}
    assert head <= set(tk["item"])


def test_freq_merge_across_shards(spark):
    df = spark.range(20_000).select(
        (F.col("id") % 311).cast("string").alias("k"), F.col("id")
    )
    shards = [df.filter(F.col("id") % 2 == i).repartition(3) for i in range(2)]
    merged = merge_freq_summaries(
        *[freq_summary(s, ["k"], cap=1000) for s in shards]
    )
    tk = topk_from_summary(merged, k=5).toPandas()
    assert (tk["max_undercount"] == 0).all()
    truth = df.toPandas()["k"].value_counts()
    for item, lo in zip(tk["item"], tk["count_lo"]):
        assert int(truth[item]) == int(lo)


def test_freq_null_handling(spark):
    df = spark.range(1_000).select(
        F.when(F.col("id") % 4 == 0, None)
        .otherwise((F.col("id") % 10).cast("string"))
        .alias("k")
    )
    summ = freq_summary(df, ["k"], cap=100)
    nulls = (
        summ.filter(F.col("kind") == "null")
        .agg(F.sum("w").cast("long").alias("n"))
        .collect()[0]["n"]
    )
    assert nulls == 250
    total = (
        summ.filter(F.col("kind") == "item")
        .agg(F.sum("w").cast("long").alias("n"))
        .collect()[0]["n"]
    )
    assert total == 750
