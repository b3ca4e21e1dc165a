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
    from autoprepad_spark.session import get_spark
    from autoprepad_spark.datagen import source_dim
    from autoprepad_spark.operators.profile import global_stats
    from autoprepad_spark.plans.suite import ValidationSuite

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
    res = ValidationSuite().run(df, dim=dim, stats=stats, violation_sink=sink)
    t["viol_write"] = time.perf_counter() - t1

    t2 = time.perf_counter()
    n_verd = res.verdicts.count()
    t["verdicts"] = time.perf_counter() - t2

    t3 = time.perf_counter()
    n_viol = res.violations.count()
    t["viol_count"] = time.perf_counter() - t3

    t["total"] = time.perf_counter() - t0
    print(json.dumps({
        "cores": cores, "rows": rows, "n_verd": n_verd, "n_viol": n_viol,
        "phases": {k: round(v, 2) for k, v in t.items()},
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]))
