"""Output sizing / compaction: file-count arithmetic and data fidelity."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from autoprepad_spark.sources.compaction import (
    compact_files,
    probe_row_bytes,
    write_sized,
)


def _docs(spark, n=20_000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("body "), F.sha2(F.col("id").cast("string"), 256)).alias(
            "text"
        ),
        (F.col("id") % 4).cast("string").alias("src"),
    )


def _data_files(path):
    return [
        os.path.join(r, f)
        for r, _d, fs in os.walk(path)
        for f in fs
        if not f.startswith(("_", "."))
    ]


def test_probe_row_bytes_is_positive_and_sane(spark):
    rb = probe_row_bytes(_docs(spark), sample_rows=5_000)
    # ~8B id + 69B string + src, parquet-encoded: order 10-200 bytes
    assert 5 < rb < 1000


def test_write_sized_probe_hits_target_band(spark, tmp_path):
    path = str(tmp_path / "sized")
    df = _docs(spark)
    report = write_sized(df, path, target_mb=1, method="probe")
    # ~20k rows * ~90B ≈ 1.8MB -> expect 2-3 files, none tiny
    assert report["n_files"] <= 4
    got = spark.read.parquet(path)
    assert got.count() == 20_000
    assert set(got.columns) == {"doc_id", "text", "src"}


def test_write_sized_rebalance_roundtrip_and_partitioning(spark, tmp_path):
    path = str(tmp_path / "reb")
    df = _docs(spark)
    conf_key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    conf_before = spark.conf.get(conf_key)  # session default, e.g. 64MB
    report = write_sized(
        df, path, target_mb=64, method="rebalance", partition_by=["src"]
    )
    assert report["method"] == "rebalance"
    got = spark.read.parquet(path)
    assert got.count() == 20_000
    # hive layout materialized per src value
    assert sorted(
        d for d in os.listdir(path) if d.startswith("src=")
    ) == [f"src={k}" for k in range(4)]
    # advisory conf restored (no leak into the session)
    assert spark.conf.get(conf_key) == conf_before


def test_compact_files_merges_small_files_exactly(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = _docs(spark, 10_000)
    df.repartition(40).write.parquet(path)  # deliberately fragmented
    before = spark.read.parquet(path)
    rows_before = sorted(r["doc_id"] for r in before.select("doc_id").collect())
    assert len(_data_files(path)) == 40
    report = compact_files(spark, path, target_mb=256)
    assert report["compacted"] is True
    assert report["n_files_after"] == 1
    after = spark.read.parquet(path)
    rows_after = sorted(r["doc_id"] for r in after.select("doc_id").collect())
    assert rows_after == rows_before


def test_compact_files_noop_when_already_compact(spark, tmp_path):
    path = str(tmp_path / "ok")
    _docs(spark, 1_000).coalesce(1).write.parquet(path)
    report = compact_files(spark, path, target_mb=256)
    assert report["compacted"] is False
    assert spark.read.parquet(path).count() == 1_000


def test_write_sized_rejects_unknown_method(spark, tmp_path):
    with pytest.raises(ValueError, match="rebalance|probe"):
        write_sized(_docs(spark, 10), str(tmp_path / "x"), method="nope")


def test_write_sized_zorder_probe_clusters_every_column(spark, tmp_path):
    """zorder_cols: sized files whose per-FILE min/max envelopes are
    tight in every clustered column (the prunable-write contract) —
    checked the way a scan planner would, by reading each output file
    alone. Guards: rebalance and partition_by are rejected."""
    rows = [(x * 32 + y, float(x), float(y)) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "rid long, x double, y double")
    path = str(tmp_path / "zsized")
    # n_rows is the caller-known-count knob; inflating it here forces a
    # multi-file layout out of 1024 tiny rows so envelopes are checkable
    rep = write_sized(
        df, path, target_mb=1, method="probe", n_rows=2_000_000,
        zorder_cols=["x", "y"],
    )
    assert rep["method"] == "probe" and rep["n_files"] >= 1
    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]
    assert len(files) >= 4
    # each file's envelope must cover a strict minority of either
    # column's range (a random or single-sorted layout fails one)
    for col in ("x", "y"):
        widths = []
        for f in files:
            one = spark.read.parquet(f).agg(
                F.min(col).alias("mn"), F.max(col).alias("mx")
            ).collect()[0]
            widths.append(one["mx"] - one["mn"])
        assert sum(widths) / len(widths) < 31.0 * 0.75, (col, widths)
    with pytest.raises(ValueError, match="explicit file count"):
        write_sized(df, path, method="rebalance", zorder_cols=["x"])
    with pytest.raises(ValueError, match="mutually exclusive"):
        write_sized(
            df, path, method="probe", zorder_cols=["x"], partition_by=["y"]
        )
    # unchanged rows round-trip
    assert spark.read.parquet(path).count() == 1024
