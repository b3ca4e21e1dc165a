"""Per-phase timing probe for ValidationSuite.run — finds the
non-scaling term in the N vs 4N bench (run under taskset like bench.py).

Usage: taskset -c 0-{N-1} python tools/phase_probe.py CORES ROWS
Prints one JSON line with per-phase wall times for one suite run
(after one warmup run).
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(cores: int, rows: int) -> None:
    from pyspark.sql import functions as F

    from autoprepad_spark.session import get_spark
    from autoprepad_spark.datagen import source_dim
    from autoprepad_spark.operators.profile import global_stats
    from autoprepad_spark.operators.marking import mark
    from autoprepad_spark.operators.referential import referential_violations
    from autoprepad_spark.operators.uniqueness import duplicate_rows
    from autoprepad_spark.plans import verdicts as V
    from autoprepad_spark.plans.suite import ValidationSuite, ALL_CHECKS

    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_spark(f"phase-probe-{cores}", cores=cores)
    tmp = os.environ.get("SPARK_BENCH_TMP", "/tmp")
    df = spark.read.parquet(os.path.join(tmp, f"bench_tok_{rows}"))
    dim = source_dim(spark)
    warm = spark.read.parquet(os.path.join(tmp, "bench_tok_warm"))
    ValidationSuite().run(warm, dim=dim).verdicts.count()

    sink = os.path.join(tmp, f"probe_sink_{cores}")
    t = {}
    t0 = time.perf_counter()

    stats = global_stats(df)
    t["fit"] = time.perf_counter() - t0

    t1 = time.perf_counter()
    marked = mark(df, stats)
    row_viol = V.explode_violations(marked)
    dup_src = df.select("part", "doc_id", "n_tok", "source")
    dup_viol = duplicate_rows(dup_src, "doc_id").select(
        "part", F.lit("unique_doc_id").alias("check_name"), "doc_id",
        F.lit(None).cast("string").alias("detail"),
    )
    ref_viol = referential_violations(
        df.select("part", "doc_id", "source"), dim
    ).select(
        "part", F.lit("ref_source").alias("check_name"), "doc_id",
        F.col("source").alias("detail"),
    )
    violations = row_viol.unionByName(dup_viol).unionByName(ref_viol)
    violations.write.mode("overwrite").parquet(sink)
    t["viol_write"] = time.perf_counter() - t1

    t2 = time.perf_counter()
    sunk = spark.read.parquet(sink)
    row_counts = df.groupBy("part").agg(F.count(F.lit(1)).alias("row_count"))
    verdicts = V.assemble_verdicts(row_counts, sunk, ALL_CHECKS)
    n_verd = verdicts.count()
    t["verdicts"] = time.perf_counter() - t2

    t3 = time.perf_counter()
    n_viol = sunk.count()
    t["viol_count"] = time.perf_counter() - t3

    t["total"] = time.perf_counter() - t0
    print(json.dumps({
        "cores": cores, "rows": rows, "n_verd": n_verd, "n_viol": n_viol,
        "phases": {k: round(v, 2) for k, v in t.items()},
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]))
