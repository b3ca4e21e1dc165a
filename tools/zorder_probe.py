"""Measure what Z-order clustering buys a selective parquet scan.

Writes the sf0.1 orders table twice — Z-ordered on
(o_custkey, o_totalprice) vs range-sorted on o_custkey alone — with
small parquet row groups, then runs narrow single-column band
predicates against both layouts and reads the FileSourceScan node's
numOutputRows metric: with filter pushdown, that metric counts rows
AFTER parquet row-group min/max skipping, so it is exactly the "how
much of the table did the storage layer actually surface" number a
100 TB scan planner cares about.

Expected shape: the x-sort layout skips well on o_custkey bands and
surfaces ~everything for o_totalprice bands; the Z-order layout skips
on BOTH. Run: python tools/zorder_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from autoprepad_spark.operators import layout as L  # noqa: E402
from autoprepad_spark.session import get_spark  # noqa: E402

TMP = os.environ.get("SPARK_BENCH_TMP", "/tmp")


def scan_rows(df) -> int:
    """numOutputRows of the scan leaf after execution = rows surviving
    parquet row-group skipping (AQE disabled in this probe session so
    the plan tree is directly traversable)."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    leaves = plan.collectLeaves()
    total = 0
    for i in range(leaves.size()):
        m = leaves.apply(i).metrics()
        if m.contains("numOutputRows"):
            total += m.apply("numOutputRows").value()
    return int(total)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("zorder-probe", cores=8, shuffle_partitions=32)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # small row groups so skipping granularity is visible at sf0.1 —
    # must go on the hadoop conf (runtime spark.conf.set of a
    # spark.hadoop.* key does NOT reach an already-created context)
    spark.sparkContext._jsc.hadoopConfiguration().set(
        "parquet.block.size", str(256 * 1024)
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cols = ["o_custkey", "o_totalprice"]
    total = orders.count()
    bounds = L.column_bounds(orders, cols)

    zpath, spath = f"{TMP}/zorder_probe_z", f"{TMP}/zorder_probe_s"
    t0 = time.monotonic()
    L.cluster_by_zorder(
        orders, cols, bits=10, num_partitions=n_files, bounds=bounds
    ).write.mode("overwrite").parquet(zpath)
    z_write = time.monotonic() - t0
    t0 = time.monotonic()
    orders.repartitionByRange(n_files, "o_custkey").sortWithinPartitions(
        "o_custkey"
    ).write.mode("overwrite").parquet(spath)
    s_write = time.monotonic() - t0

    out = {"rows": total, "n_files": n_files, "z_write_sec": round(z_write, 2),
           "sort_write_sec": round(s_write, 2), "probes": {}}
    int_cols = {
        f.name
        for f in orders.schema.fields
        if f.dataType.simpleString() in ("int", "bigint", "smallint", "tinyint")
    }
    for col in cols:
        lo, hi = bounds[col]
        width = (hi - lo) * 0.02  # 2% band
        a, b = lo + (hi - lo) * 0.5, lo + (hi - lo) * 0.5 + width
        if col in int_cols:
            # literal type must match the column type or the pushed
            # filter wraps the column in a cast and parquet can't use
            # its min/max stats at all
            a, b = int(a), int(b)
        for name, path in (("zorder", zpath), ("xsort", spath)):
            q = spark.read.parquet(path).filter(
                (F.col(col) >= a) & (F.col(col) <= b)
            )
            surfaced = scan_rows(q)
            sel = q.count()
            out["probes"][f"{col}:{name}"] = {
                "selected": sel,
                "scan_rows_after_skipping": surfaced,
                "fraction_of_table_surfaced": round(surfaced / total, 4),
            }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
