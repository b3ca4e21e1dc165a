"""Z-order clustering + key-skew profile (operators/layout.py).

Oracles: the Z-value is exact integer math recomputed bit-for-bit in
Python; locality is asserted the way a scan planner sees it — count the
output partitions whose per-partition min/max envelope overlaps a
predicate range (parquet footer pruning semantics), Z-order vs a plain
single-column sort.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from autoprepad_spark.operators import layout as L

GRID = 32  # 32x32 integer grid, bits=5 quantizes losslessly


@pytest.fixture(scope="module")
def grid_df(spark):
    rows = [(x * GRID + y, float(x), float(y)) for x in range(GRID) for y in range(GRID)]
    return spark.createDataFrame(rows, "rid long, x double, y double")


def _py_zvalue(qx: int, qy: int, bits: int) -> int:
    z = 0
    for j in range(bits):
        z |= ((qx >> j) & 1) << (j * 2)
        z |= ((qy >> j) & 1) << (j * 2 + 1)
    return z


def test_zorder_key_matches_python_bit_interleave(grid_df):
    bounds = L.column_bounds(grid_df, ["x", "y"])
    assert bounds == {"x": (0.0, 31.0), "y": (0.0, 31.0)}
    got = grid_df.select(
        "x", "y", L.zorder_key(["x", "y"], bounds, bits=5).alias("z")
    ).collect()
    for r in got:
        # bits=5 over [0,31]: quantization is the identity on the grid
        assert r["z"] == _py_zvalue(int(r["x"]), int(r["y"]), 5)


def test_zorder_locality_beats_single_column_sort(spark, grid_df):
    """Pruning view: partitions whose [min,max] envelope overlaps a
    narrow band. Z-order keeps BOTH columns' envelopes tight; a plain
    x-sort makes every partition cover the full y range."""
    P = 16

    def overlapping(df, col, lo, hi):
        env = (
            df.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid")
            .agg(F.min(col).alias("mn"), F.max(col).alias("mx"))
            .collect()
        )
        assert len(env) == P  # every output partition non-empty
        return sum(1 for r in env if r["mx"] >= lo and r["mn"] <= hi)

    z = L.cluster_by_zorder(grid_df, ["x", "y"], bits=5, num_partitions=P)
    xsort = grid_df.repartitionByRange(P, "x").sortWithinPartitions("x")

    # plain x-sort: perfect for x-bands, useless for y-bands
    assert overlapping(xsort, "x", 10.0, 13.0) <= 4
    assert overlapping(xsort, "y", 10.0, 13.0) == P

    # z-order: BOTH bands prune to a minority of partitions
    zx, zy = overlapping(z, "x", 10.0, 13.0), overlapping(z, "y", 10.0, 13.0)
    assert zx <= P // 2, zx
    assert zy <= P // 2, zy


def test_cluster_by_zorder_is_one_range_shuffle(grid_df):
    out = L.cluster_by_zorder(grid_df, ["x", "y"], bits=5, num_partitions=8)
    # plan shape BEFORE execution (AQE's executed plan folds the
    # exchange into a query stage and truncates the string)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("rangepartitioning") == 1
    assert out.rdd.getNumPartitions() == 8
    assert "_zkey" not in out.columns  # dropped unless keep_key


def test_zorder_guards_and_edge_cases(spark, grid_df):
    bounds = {"x": (0.0, 31.0)} | {f"c{i}": (0.0, 1.0) for i in range(7)}
    with pytest.raises(ValueError, match="exceeds a long"):
        L.zorder_key(["x"] + [f"c{i}" for i in range(7)], bounds, bits=8)
    with pytest.raises(ValueError, match="at least one column"):
        L.zorder_key([], {}, bits=8)
    # constant + null columns quantize to bucket 0, nulls sort first
    df = spark.createDataFrame(
        [(1, 5.0, None), (2, 5.0, 3.0)], "rid long, c double, d double"
    )
    b = L.column_bounds(df, ["c", "d"])
    assert b["c"] == (5.0, 5.0) and b["d"] == (3.0, 3.0)
    z = {r["rid"]: r["z"] for r in df.select(
        "rid", L.zorder_key(["c", "d"], b, bits=4).alias("z")).collect()}
    assert z[1] == 0 and z[2] == 0  # both constant/null -> bucket 0


def test_key_skew_profile_matches_python_counts(spark):
    rows = [("hot",)] * 70 + [("warm",)] * 20 + [(f"k{i}",) for i in range(10)]
    df = spark.createDataFrame(rows, "k string").repartition(8)
    out = L.key_skew_profile(df, "k", top=3, target_partitions=10).collect()
    summary = next(r for r in out if r["kind"] == "summary")
    assert summary["cnt"] == 100
    assert summary["share"] == pytest.approx(0.70)
    # heaviest key (70 rows) vs avg partition of 10 rows -> salt 7
    assert summary["suggested_salt"] == math.ceil(70 / (100 / 10))
    keys = [(r["rank"], r["key"], r["cnt"]) for r in out if r["kind"] == "key"]
    assert keys == [(1, "hot", 70), (2, "warm", 20), (3, "k0", 1)]
    assert all(r["suggested_salt"] == summary["suggested_salt"] for r in out)


def test_zorder_key_clamps_stale_bounds_and_nulls(spark):
    """Incremental reality: bounds fitted on an earlier shard, applied
    to data that exceeds them (plus nulls and negatives). Out-of-range
    values clamp to the edge buckets — same semantics as the Python
    mirror — so a stale-bounds rewrite degrades to coarser clustering,
    never to a wrong/overflowed key."""
    bits = 4
    bounds = {"a": (-10.0, 10.0), "b": (0.0, 5.0)}
    rows = [
        (0, -50.0, 2.5),   # a far below lo -> bucket 0
        (1, 50.0, 2.5),    # a far above hi -> bucket 15
        (2, None, 2.5),    # null -> bucket 0
        (3, -10.0, 99.0),  # b above hi -> bucket 15
        (4, 10.0, -1.0),   # b below lo -> bucket 0
        (5, 0.0, 2.5),     # interior
    ]
    df = spark.createDataFrame(rows, "rid long, a double, b double")
    got = {r["rid"]: r["z"] for r in df.select(
        "rid", L.zorder_key(["a", "b"], bounds, bits=bits).alias("z")
    ).collect()}

    def q(x, lo, hi):
        if x is None:
            return 0
        buckets = (1 << bits) - 1
        return max(0, min(buckets, math.floor((x - lo) * buckets / (hi - lo))))

    def z(a, b):
        qa, qb = q(a, *bounds["a"]), q(b, *bounds["b"])
        out = 0
        for j in range(bits):
            out |= ((qa >> j) & 1) << (j * 2)
            out |= ((qb >> j) & 1) << (j * 2 + 1)
        return out

    for rid, a, b in [(r[0], r[1], r[2]) for r in rows]:
        assert got[rid] == z(a, b), rid
    # keys stay within the k*bits bit budget whatever the input
    assert all(0 <= v < (1 << (2 * bits)) for v in got.values())


def test_cluster_by_zorder_rejects_all_degenerate_columns(spark):
    """A constant / non-numeric clustering set would make the Z-key a
    single constant and collapse repartitionByRange to ONE task writing
    everything — raise instead (a string column casts to all-null
    bounds and must land here too)."""
    df = spark.createDataFrame(
        [(1, 5.0, "a"), (2, 5.0, "b")], "rid long, c double, s string"
    )
    with pytest.raises(ValueError, match="degenerate"):
        L.cluster_by_zorder(df, ["c"], num_partitions=4)
    with pytest.raises(ValueError, match="degenerate"):
        L.cluster_by_zorder(df, ["s"], num_partitions=4)
    # one live column among degenerate ones is fine (coarser, not wrong)
    df2 = spark.createDataFrame(
        [(i, 5.0, float(i)) for i in range(16)], "rid long, c double, d double"
    )
    out = L.cluster_by_zorder(df2, ["c", "d"], num_partitions=2)
    assert out.count() == 16
