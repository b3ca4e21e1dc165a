"""Token-weighted source mixing and deterministic shuffle/sharding."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from autoprepad_spark.operators.ordering import (
    ORDER_COL,
    assign_shards,
    training_order,
)
from autoprepad_spark.operators.sampling import (
    mix_by_tokens,
    mix_rates,
    temperature_mix_rates,
)


def test_temperature_mix_rates_hand_example(spark):
    # masses A=1000, B=4000. alpha=0.5 -> targets ~ (31.6, 63.2), i.e.
    # shares (1/3, 2/3). avail/target: A -> 3000, B -> 6000 => A binds
    # (rate 1.0), B keeps 3000 * (2/3) / 4000 = 0.5.
    df = spark.createDataFrame(
        [("a1", "A", 1000), ("b1", "B", 2500), ("b2", "B", 1500)],
        ["doc_id", "source", "n_tok"],
    )
    rates = temperature_mix_rates(df, 0.5)
    assert rates["A"] == pytest.approx(1.0)
    assert rates["B"] == pytest.approx(0.5)

    # alpha=1 keeps the natural mix: every group at rate 1.0
    nat = temperature_mix_rates(df, 1.0)
    assert nat["A"] == pytest.approx(1.0) and nat["B"] == pytest.approx(1.0)

    # alpha=0 -> uniform target: B (rich) downsampled to A's mass
    uni = temperature_mix_rates(df, 0.0)
    assert uni["A"] == pytest.approx(1.0)
    assert uni["B"] == pytest.approx(0.25)

    with pytest.raises(ValueError):
        temperature_mix_rates(df, -0.1)


def test_temperature_mix_realized_shares(tokens_df):
    # realized token shares approach mass^alpha / sum(mass^alpha)
    alpha = 0.5
    rates = temperature_mix_rates(tokens_df, alpha)
    from autoprepad_spark.operators.sampling import stratified_sample

    mixed = stratified_sample(
        tokens_df, rates, group_col="source", key_col="doc_id", default=0.0,
        salt="tmix",
    )
    mass = {
        r["source"]: r["w"]
        for r in tokens_df.groupBy("source").agg(F.sum("n_tok").alias("w")).collect()
    }
    want_z = sum(m**alpha for m in mass.values())
    got = {
        r["source"]: r["w"]
        for r in mixed.groupBy("source").agg(F.sum("n_tok").alias("w")).collect()
    }
    total = sum(got.values())
    for g, m in mass.items():
        assert got[g] / total == pytest.approx(m**alpha / want_z, rel=0.15)


def test_mix_rates_hand_example(spark):
    # A has 1000 tokens, B has 3000; a 50/50 target binds on A:
    # scale = min(1000/.5, 3000/.5) = 2000 -> A keeps 1.0, B keeps 1/3
    df = spark.createDataFrame(
        [("a1", "A", 400), ("a2", "A", 600), ("b1", "B", 3000)],
        ["doc_id", "source", "n_tok"],
    )
    rates = mix_rates(df, {"A": 0.5, "B": 0.5})
    assert rates["A"] == pytest.approx(1.0)
    assert rates["B"] == pytest.approx(1 / 3)

    with pytest.raises(ValueError):
        mix_rates(df, {"Z": 1.0})


def test_mix_by_tokens_realizes_target(tokens_df):
    targets = {"web": 0.5, "books": 0.3, "code": 0.2}
    mixed = mix_by_tokens(tokens_df, targets)
    got = {
        r["source"]: r["w"]
        for r in mixed.groupBy("source").agg(F.sum("n_tok").alias("w")).collect()
    }
    # untargeted sources dropped entirely
    assert set(got) == set(targets)
    total = sum(got.values())
    for s, frac in targets.items():
        assert got[s] / total == pytest.approx(frac, rel=0.1)
    # binding source is kept whole (rate 1.0 -> all its tokens survive)
    rates = mix_rates(tokens_df, targets)
    binding = max(rates, key=rates.get)
    assert rates[binding] == pytest.approx(1.0)
    orig = (
        tokens_df.filter(F.col("source") == binding)
        .agg(F.sum("n_tok")).collect()[0][0]
    )
    assert got[binding] == orig


def test_mix_is_parallelism_independent(tokens_df):
    targets = {"web": 0.6, "wiki": 0.4}
    a = mix_by_tokens(tokens_df, targets)
    b = mix_by_tokens(tokens_df.repartition(17), targets)
    assert a.count() == b.count()
    assert a.select("doc_id").exceptAll(b.select("doc_id")).count() == 0


def test_assign_shards_stable_balanced_covering(tokens_df):
    n = 16
    sh = assign_shards(tokens_df, n, seed=5)
    counts = {r["shard"]: r["count"] for r in sh.groupBy("shard").count().collect()}
    assert set(counts) == set(range(n))            # covering
    mean = sum(counts.values()) / n
    assert all(abs(c - mean) / mean < 0.15 for c in counts.values())  # uniform
    # bit-stable across input partitioning
    sh2 = assign_shards(tokens_df.repartition(7), n, seed=5)
    assert sh.select("doc_id", "shard").exceptAll(
        sh2.select("doc_id", "shard")
    ).count() == 0
    # a different seed gives a different (independent) assignment
    sh3 = assign_shards(tokens_df, n, seed=6)
    moved = (
        sh.select("doc_id", "shard")
        .join(sh3.select("doc_id", F.col("shard").alias("s3")), "doc_id")
        .filter("shard != s3")
        .count()
    )
    assert moved > 0


def test_training_order_is_total_and_deterministic(tokens_df):
    """Output partitions are internally sorted with non-overlapping,
    increasing ranges — so concatenating them in partition order IS the
    global order by shuffle key, regardless of input partitioning."""

    def partition_ranges(df):
        def stats(it):
            rows = [r[ORDER_COL] for r in it]
            if rows:
                yield (rows == sorted(rows), min(rows), max(rows), len(rows))

        return (
            training_order(df, 8, seed=3)
            .select(ORDER_COL)
            .rdd.mapPartitions(stats)
            .collect()
        )

    a = partition_ranges(tokens_df)
    b = partition_ranges(tokens_df.repartition(13))
    for ranges in (a, b):
        assert all(is_sorted for is_sorted, *_ in ranges)
        for (_, _, hi1, _), (_, lo2, _, _) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2  # ranges non-overlapping, in partition order
    # same total row count and same global extremes at both partitionings
    assert sum(n for *_, n in a) == sum(n for *_, n in b) == tokens_df.count()
    assert (a[0][1], a[-1][2]) == (b[0][1], b[-1][2])


def test_weighted_sample_matches_hashlib_oracle(spark):
    """Exact membership: the Spark filter keeps precisely the rows whose
    md5-derived uniform draw is below the clamped weight."""
    import hashlib

    from autoprepad_spark.operators.sampling import weighted_sample

    rows = [
        (f"d{i:03d}", [None, -0.5, 0.0, 0.2, 0.5, 0.9, 1.0, 2.5][i % 8])
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id string, q double")
    got = {r["doc_id"] for r in weighted_sample(df, weight_col="q").collect()}

    def draw(key):
        h = hashlib.md5((key + "wsample").encode()).hexdigest()
        return int(h[:8], 16) / 16**8

    want = {
        k
        for k, q in rows
        if q is not None and draw(k) < min(max(q, 0.0), 1.0)
    }
    assert got == want
    assert 0 < len(want) < 400  # both outcomes exercised


def test_weighted_sample_target_fraction_and_independence(spark):
    import hashlib

    from autoprepad_spark.operators.sampling import weighted_sample

    rows = [(f"d{i:04d}", float(1 + i % 5)) for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id string, q double")
    kept = weighted_sample(df, weight_col="q", target_fraction=0.3)
    ids1 = {r["doc_id"] for r in kept.collect()}
    # exact membership under the scaled weights (c = target*n/sum(w))
    c = 0.3 * len(rows) / sum(q for _, q in rows)

    def draw(key):
        h = hashlib.md5((key + "wsample").encode()).hexdigest()
        return int(h[:8], 16) / 16**8

    want = {k for k, q in rows if draw(k) < min(c * q, 1.0)}
    assert ids1 == want
    # realized rate near target (no weight saturates here: max c*q < 1)
    assert abs(len(ids1) / len(rows) - 0.3) < 0.02
    # higher-quality rows kept at proportionally higher rates
    by_q = {}
    for k, q in rows:
        by_q.setdefault(q, []).append(k in ids1)
    rates = {q: sum(v) / len(v) for q, v in by_q.items()}
    assert rates[5.0] > rates[2.0] > rates[1.0]
    # parallelism independence
    ids7 = {
        r["doc_id"]
        for r in weighted_sample(
            df.repartition(7), weight_col="q", target_fraction=0.3
        ).collect()
    }
    assert ids7 == ids1


def test_weighted_sample_plan_is_scan_level_filter(spark):
    from autoprepad_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame([("a", 0.5)], "doc_id string, q double")
    plan = (
        weighted_sample(df, weight_col="q")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan
