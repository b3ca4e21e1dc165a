"""Bucketed-index (storage-partitioned join) variant of the shard
dedup: results must equal the prefilter path exactly, and the physical
plan must read the bucketed history with NO Exchange above its scan —
the claim write_bucketed_index's docstring makes.

Broadcast thresholds are disabled inside the test so the planner is
forced to the sort-merge shape the claim is about (at real history
sizes it is forced there by the stats); restored afterwards.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from autoprepad_spark.operators import incremental as INC

from tests.test_incremental import HIST, SHARD


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    hist = spark.createDataFrame(HIST, ["doc_id", "text"])
    index = INC.build_dedup_index(hist)
    base = str(tmp_path_factory.mktemp("bucketed_idx"))
    INC.write_bucketed_index(index, "t_bidx", buckets=4, path=base)
    yield INC.read_bucketed_index(spark, "t_bidx")
    spark.sql("DROP TABLE IF EXISTS t_bidx")
    spark.sql("DROP TABLE IF EXISTS t_bidx_bands")


@pytest.fixture()
def no_broadcast(spark):
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    old = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _outputs(kept, dropped):
    return (
        sorted(r["doc_id"] for r in kept.select("doc_id").collect()),
        sorted(tuple(r) for r in dropped.collect()),
    )


def test_bucketed_results_equal_prefilter_path(spark, bucketed, no_broadcast):
    idx, banded = bucketed
    shard = spark.createDataFrame(SHARD, ["doc_id", "text"])
    got = _outputs(
        *INC.dedup_against_index(
            shard, idx, threshold=0.9,
            prefilter_history=False, banded_index=banded,
        )
    )
    hist = spark.createDataFrame(HIST, ["doc_id", "text"])
    ref_index = INC.build_dedup_index(hist)
    want = _outputs(
        *INC.dedup_against_index(
            shard, ref_index, threshold=0.9, prefilter_history=True
        )
    )
    assert got == want


def _executed_plan(df) -> str:
    df.count()  # let AQE finalize
    return df._jdf.queryExecution().executedPlan().toString()


def test_history_scan_is_bucketed_and_exchange_free(
    spark, bucketed, no_broadcast
):
    """The exact anti-join against the content_hash-bucketed table must
    scan the history in place: `Bucketed: true` with no Exchange on the
    history branch (the only Exchange in the join is the shard side)."""
    idx, _ = bucketed
    shard = spark.createDataFrame(SHARD, ["doc_id", "text"]).withColumn(
        "content_hash", INC.content_hash("text")
    )
    j = shard.join(idx.select("content_hash"), "content_hash", "left_anti")
    plan = _executed_plan(j)
    assert "Bucketed: true" in plan
    # exactly one exchange: the shard side being clustered to the
    # table's bucketing; a second one would mean the history moved
    assert plan.count("Exchange hashpartitioning") == 1


def test_band_count_and_cap_join_are_exchange_free(
    spark, bucketed, no_broadcast
):
    """groupBy(band, bucket) + the cap join over the (band, bucket)-
    bucketed band table must be satisfied by the storage partitioning:
    no Exchange anywhere in the aggregation-and-filter subplan."""
    _, banded = bucketed
    bucket_n = banded.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("_bn")
    )
    capped = banded.join(bucket_n, ["band", "bucket"]).filter(F.col("_bn") <= 50)
    plan = _executed_plan(capped)
    assert "Bucketed: true" in plan
    assert "Exchange hashpartitioning" not in plan
