"""Output file sizing and compaction.

At 100 TB the sink's file layout IS a correctness concern for the next
reader: a shuffle that ends in 20k tasks writes 20k files per partition
(NameNode/S3-listing pressure, tiny row groups, dead scan parallelism),
while one giant file serializes the next scan. Engines solve this with
target-size writes (Iceberg's write.target-file-size-bytes, Delta
OPTIMIZE); on plain Spark the answer is AQE rebalancing or an explicit
partition-count computed from measured bytes. This module provides the
three production shapes:

* ``write_sized(method="rebalance")`` — the default. Inserts a
  REBALANCE hint so AQE coalesces/splits shuffle blocks to
  ``spark.sql.adaptive.advisoryPartitionSizeInBytes`` (set from
  target_mb and an encoding ratio): no extra scan, skew-safe (AQE
  splits oversized blocks, unlike coalesce()), and the file count
  adapts to the actual data volume at runtime — the property that
  survives a 100x scale-up, where any hand-picked ``repartition(n)``
  constant is wrong at one end or the other.
* ``write_sized(method="probe")`` — measures the ENCODED bytes/row by
  writing a bounded sample, then repartitions to
  ceil(n_rows * row_bytes / target). Two extra bounded jobs; use when
  the shuffle-bytes→parquet-bytes ratio is unknown (heavy compression,
  wide strings) and the file-size band must be tight.
* ``compact_files`` — post-hoc rewrite of an existing directory using
  the EXACT on-disk listing (no estimation at all); the Spark analog of
  Iceberg rewrite_data_files for outputs that accreted small files
  across many incremental appends (e.g. the shard-at-a-time flows in
  operators/incremental.py).

Reference parity: AutoPrepAD writes single-process CSV (main.py:33) —
file layout is a non-problem at pandas scale; this module exists for
the north-rule scale where it is.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

#: parquet-encoded bytes per shuffle byte is workload-dependent; 0.5 is
#: a conservative default (dictionary+RLE+snappy on typical mixed rows)
DEFAULT_ENCODING_RATIO = 0.5


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def probe_row_bytes(
    df: DataFrame, *, sample_rows: int = 100_000, fmt: str = "parquet"
) -> float:
    """Measured encoded bytes/row: write a bounded sample to a scratch
    dir, size it, delete it. limit() short-circuits the scan (first
    partitions only) — fine for sizing, not a uniform sample."""
    spark = df.sparkSession
    scratch = os.path.join(
        spark.conf.get("spark.local.dir", "/tmp"), f"_size_probe_{uuid.uuid4().hex}"
    )
    sample = df.limit(sample_rows).coalesce(1)
    try:
        sample.write.mode("overwrite").format(fmt).save(scratch)
        n = spark.read.format(fmt).load(scratch).count()
        return _dir_bytes(scratch) / max(n, 1)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def write_sized(
    df: DataFrame,
    path: str,
    *,
    target_mb: int = 256,
    method: str = "rebalance",
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    encoding_ratio: float = DEFAULT_ENCODING_RATIO,
    n_rows: int | None = None,
    zorder_cols: list[str] | None = None,
) -> dict:
    """Write ``df`` so output files land near ``target_mb`` each.

    zorder_cols: cluster the output on a Z-order key over these columns
    (operators/layout.py) so every sized file also carries a tight
    min/max envelope in EVERY listed column — sized AND prunable in one
    write. Requires an explicit file count, so it forces the probe
    flow (raises under method="rebalance": AQE's rebalance replaces the
    range partitioning a Z-order needs); mutually exclusive with
    ``partition_by`` (Z-ordering inside hive partitions is a per-
    partition rewrite — use compact_files on each partition directory).

    rebalance: REBALANCE(partition_by...) + AQE advisory size =
    target_mb / encoding_ratio (shuffle bytes are pre-encoding, so the
    advisory must be larger than the wanted file size). Keyed rebalance
    co-locates rows of one hive partition, so each ``partition_by``
    directory is written by few tasks instead of every task appending a
    sliver to every directory — the small-files explosion is
    |partitions| + spill, not |partitions| x |tasks|.

    probe: exact encoded-size arithmetic; pass ``n_rows`` if known to
    skip the count job.

    Returns a report dict (method, n_files, bytes, target honored).
    """
    spark = df.sparkSession
    if zorder_cols:
        if method == "rebalance":
            raise ValueError(
                "zorder_cols needs an explicit file count: use "
                "method='probe' (AQE rebalance would replace the "
                "Z-order range partitioning)"
            )
        if partition_by:
            raise ValueError(
                "zorder_cols and partition_by are mutually exclusive; "
                "Z-order inside hive partitions via compact_files per "
                "partition directory"
            )
    if method == "rebalance":
        advisory = int(target_mb * 1024 * 1024 / encoding_ratio)
        conf = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
        prev = spark.conf.get(conf, None)
        spark.conf.set(conf, str(advisory))
        try:
            out = df.hint("rebalance", *(partition_by or []))
            w = out.write.mode(mode).format(fmt)
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.save(path)
        finally:
            if prev is not None:
                spark.conf.set(conf, prev)
            else:
                spark.conf.unset(conf)
    elif method == "probe":
        row_bytes = probe_row_bytes(df, fmt=fmt)
        if n_rows is None:
            n_rows = df.count()
        n_files = max(1, math.ceil(n_rows * row_bytes / (target_mb * 1024 * 1024)))
        if zorder_cols:
            from autoprepad_spark.operators.layout import cluster_by_zorder

            out = cluster_by_zorder(df, zorder_cols, num_partitions=n_files)
        elif partition_by:
            out = df.repartition(n_files, *partition_by)
        else:
            out = df.repartition(n_files)
        w = out.write.mode(mode).format(fmt)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.save(path)
    else:
        raise ValueError(f"unknown method {method!r} (rebalance|probe)")
    total = _dir_bytes(path)
    n_files = sum(
        1
        for root, _d, files in os.walk(path)
        for f in files
        if f.endswith(f".{fmt}") or (not f.startswith(("_", ".")) and "." in f)
    )
    return {
        "method": method,
        "bytes": total,
        "n_files": n_files,
        "avg_file_mb": round(total / max(n_files, 1) / 1024 / 1024, 2),
        "target_mb": target_mb,
    }


def compact_files(
    spark: SparkSession,
    path: str,
    *,
    target_mb: int = 256,
    fmt: str = "parquet",
    min_files_to_compact: int = 2,
) -> dict:
    """Rewrite an existing directory into ~target_mb files using the
    EXACT on-disk byte count (no estimation). Safe rewrite protocol:
    write to a sibling temp dir, then atomically swap — a crash never
    leaves the original truncated (rename is the commit point, the same
    reasoning as Spark's v2 file committer).

    Scale note: at real scale this is Iceberg rewrite_data_files /
    Delta OPTIMIZE — catalog-transactional instead of rename-based, and
    applied per partition; the sandbox version operates on one
    directory = one partition.
    """
    before = _dir_bytes(path)
    files = [
        f
        for root, _d, fs in os.walk(path)
        for f in fs
        if not f.startswith(("_", "."))
    ]
    n_before = len(files)
    n_files = max(1, math.ceil(before / (target_mb * 1024 * 1024)))
    if n_before < min_files_to_compact or n_files >= n_before:
        return {
            "compacted": False,
            "n_files_before": n_before,
            "n_files_after": n_before,
            "bytes": before,
        }
    df = spark.read.format(fmt).load(path)
    tmp = f"{path}__compact_{uuid.uuid4().hex}"
    # coalesce, not repartition: pure file-merge must not pay a shuffle
    df.coalesce(n_files).write.mode("overwrite").format(fmt).save(tmp)
    old = f"{path}__old_{uuid.uuid4().hex}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    after_files = [
        f
        for root, _d, fs in os.walk(path)
        for f in fs
        if not f.startswith(("_", "."))
    ]
    return {
        "compacted": True,
        "n_files_before": n_before,
        "n_files_after": len(after_files),
        "bytes": _dir_bytes(path),
    }
