"""Constraint-suggestion family N vs 4N scaling evidence — the
bench.py --scaling methodology applied to operators/suggest.py so the
profile-to-constraints loop's 100-TB story is measured, not argued.

Pipeline per parallelism level (fresh taskset-pinned worker) over a
synthetic wide table (pure codegen expressions of the row id —
parallelism-independent by construction, nothing stored):

    column_profile   (ONE wide agg: count/nulls/min/max/HLL++ per col)
    suggest_checks   (profile reuse + estimate-gated exact-domain pass)
    suggest_fds      (all candidate pairs, one melt scan + agg cascade)

Cross-level checks: the profile frame, the suggestion set, and the FD
verdict rows must be IDENTICAL at both core counts (every stat here is
exact or order-independent — any drift is a bug).

Usage: python tools/suggest_scale.py [rows] [n_cores] [n4_cores]
Internal: --worker cores rows
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SEED = 9


def synth_wide(spark, rows: int):
    """Deterministic wide table: every column a codegen expression of
    the row id — small domains (status/region/tier), a functional pair
    (tier -> tier_name), numerics with nulls, and a near-unique key."""
    from pyspark.sql import functions as F

    i = F.col("id")

    def hx(salt: int):
        return F.pmod(F.xxhash64(i, F.lit(SEED + salt)), F.lit(10_000))

    return (
        spark.range(rows)
        .withColumn("key", F.concat(F.lit("k-"), F.lpad(i.cast("string"), 12, "0")))
        .withColumn("status", F.element_at(
            F.array(F.lit("ok"), F.lit("warn"), F.lit("fail")),
            F.pmod(hx(1), F.lit(3)).cast("int") + 1))
        .withColumn("region", F.pmod(hx(2), F.lit(7)).cast("int"))
        .withColumn("tier", F.pmod(hx(3), F.lit(4)).cast("int"))
        .withColumn("tier_name", F.concat(F.lit("T"), F.col("tier").cast("string")))
        .withColumn("amount", F.when(
            F.pmod(hx(4), F.lit(50)) == 0, F.lit(None).cast("double")
        ).otherwise(hx(5).cast("double") / 100.0))
        .withColumn("qty", F.pmod(hx(6), F.lit(1000)).cast("int"))
        .drop("id")
    )


def run_worker(cores: int, rows: int) -> None:
    from autoprepad_spark.operators import suggest as SG
    from autoprepad_spark.session import get_spark

    spark = get_spark(f"suggest-scale-{cores}", cores=cores,
                      shuffle_partitions=max(cores, 8))
    df = synth_wide(spark, rows).repartition(32).cache()
    df.count()  # materialize outside the timed phases

    t0 = time.monotonic()
    prof = SG.column_profile(df)
    prof_rows = sorted(tuple(r) for r in prof.collect())
    profile_s = time.monotonic() - t0

    t0 = time.monotonic()
    sugg = SG.suggest_checks(df, profile=prof)
    sugg_rows = sorted(tuple(r) for r in sugg.collect())
    suggest_s = time.monotonic() - t0

    # det cap 2000 admits qty (1000 groups) as a determinant — real
    # melt work — while cardinality pruning settles every pair with a
    # near-unique dependent (key, amount) from the profile alone
    t0 = time.monotonic()
    fds = SG.suggest_fds(df, profile=prof, max_determinant_distinct=2000)
    fd_rows = sorted(tuple(r) for r in fds.collect())
    fd_s = time.monotonic() - t0

    def h(rows_):
        m = hashlib.sha256()
        for r in rows_:
            m.update(repr(r).encode())
        return m.hexdigest()[:16]

    print(json.dumps({
        "cores": cores,
        "rows": rows,
        "profile_sec": round(profile_s, 3),
        "profile_rows_per_sec": round(rows / profile_s, 1),
        "suggest_sec": round(suggest_s, 3),
        "fd_sec": round(fd_s, 3),
        "fd_rows_per_sec": round(rows / fd_s, 1),
        "n_suggestions": len(sugg_rows),
        "n_fd_pairs": len(fd_rows),
        "profile_hash": h(prof_rows),
        "suggest_hash": h(sugg_rows),
        "fd_hash": h(fd_rows),
    }))


def main(rows: int, n_cores: int, n4_cores: int) -> None:
    results = {}
    for cores in (n_cores, n4_cores):
        cmd = [sys.executable, os.path.abspath(__file__), "--worker",
               str(cores), str(rows)]
        if os.path.exists("/usr/bin/taskset"):
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        p = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
        lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not lines:
            print(p.stdout, p.stderr, file=sys.stderr)
            raise SystemExit(f"worker cores={cores} failed")
        results[cores] = json.loads(lines[-1])
        print(f"# cores={cores}: {results[cores]}", file=sys.stderr)
    rn, rn4 = results[n_cores], results[n4_cores]
    ratio = n4_cores / n_cores
    print(json.dumps({
        "metric": f"suggest_scaling_local{n_cores}_vs_local{n4_cores}",
        "rows": rows,
        "eff_profile": round(
            rn4["profile_rows_per_sec"] / rn["profile_rows_per_sec"] / ratio, 3),
        "eff_fd": round(
            rn4["fd_rows_per_sec"] / rn["fd_rows_per_sec"] / ratio, 3),
        "suggest_sec": {str(n_cores): rn["suggest_sec"],
                        str(n4_cores): rn4["suggest_sec"]},
        "outputs_identical": all(
            rn[k] == rn4[k]
            for k in ("profile_hash", "suggest_hash", "fd_hash",
                      "n_suggestions", "n_fd_pairs")),
        "n": rn, "n4": rn4,
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        run_worker(int(sys.argv[2]), int(sys.argv[3]))
    else:
        rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
        n4 = int(sys.argv[3]) if len(sys.argv) > 3 else 16
        main(rows, n, n4)
