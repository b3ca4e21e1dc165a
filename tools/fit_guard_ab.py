"""A/B the histogram-fit guard strategies at sf0.1 (round-4 item #2).

The round-3 guard (persist MEMORY_AND_DISK -> count -> toPandas) costs
one extra action per fit and was measured as the main reason the
robust-stat query family grew 1.6-3x at sf0.1. Candidate single-action
shapes:

  A  persist+count+toPandas        (r3 current)
  B  limit(cap+1).toPandas()       (guard rides the collecting action:
                                    CollectLimitExec = per-partition
                                    localLimit -> 1-partition shuffle ->
                                    globalLimit; upstream agg runs once)
  C  toPandas() unguarded          (r2 shape — lower bound, NOT safe)

Run: python tools/fit_guard_ab.py [sf_dir]
"""
from __future__ import annotations

import sys
import time

import numpy as np
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

sys.path.insert(0, "/root/repo")

from autoprepad_spark.session import get_spark  # noqa: E402

CAP = 2_000_000
COLS = ["l_quantity", "l_extendedprice", "l_discount"]


def _pairs(cols):
    return F.explode(
        F.array(*[
            F.struct(F.lit(c).alias("c"), F.col(c).cast("double").alias("v"))
            for c in cols
        ])
    )


def hist_frame(df, cols):
    return (
        df.select(_pairs(cols).alias("p"))
        .select(F.col("p.c").alias("c"), F.col("p.v").alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("c", "v")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def variant_a(df, cols):
    hist = hist_frame(df, cols).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        n = hist.count()
        assert n <= CAP
        return hist.toPandas()
    finally:
        hist.unpersist()


def variant_b(df, cols):
    pdf = hist_frame(df, cols).limit(CAP + 1).toPandas()
    assert len(pdf) <= CAP
    return pdf


def variant_c(df, cols):
    return hist_frame(df, cols).toPandas()


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("fit-ab", cores=32)
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    # warm: JVM codegen + page cache once, so variants compare plans
    hist_frame(li, COLS).count()
    out = {}
    for name, fn in [("A_persist_count", variant_a),
                     ("B_limit_collect", variant_b),
                     ("C_unguarded", variant_c)]:
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            pdf = fn(li, COLS)
            times.append(time.perf_counter() - t0)
        out[name] = (min(times), len(pdf))
        print(f"{name}: min {min(times):.3f}s  (cells={len(pdf)}) runs={[round(t,3) for t in times]}")
    # sanity: identical histograms
    a = variant_a(li, COLS).sort_values(["c", "v"]).reset_index(drop=True)
    b = variant_b(li, COLS).sort_values(["c", "v"]).reset_index(drop=True)
    assert (a["v"].to_numpy() == b["v"].to_numpy()).all()
    assert (a["n"].to_numpy() == b["n"].to_numpy()).all()
    print("histograms identical: True")
    spark.stop()


if __name__ == "__main__":
    main()
