"""Embedding-family N vs 4N scaling evidence (JL / PCA / compressed
top-k) — the bench.py --scaling methodology applied to the round-4
similarity additions so their 100-TB story is measured, not argued.

Pipeline per parallelism level (fresh taskset-pinned worker):

    corpus (1M x 64-dim synthetic vectors, pure codegen expression of
    vec_id — parallelism-independent by construction, no stored data)
      -> jl_project md5int 64d -> 16d  (Arrow matmul; exact integers)
      -> fit_pca k=8              (mapInPandas Gramian + fan-in tree)
      -> jl_topk 16 queries vs corpus in compressed space

Timed phases: project / fit / topk. Cross-level checks:
  * jl: projected-coordinate SUM and top-k result hash must be
    IDENTICAL (exact-integer contract — any drift is a bug);
  * pca: eigenvalues equal within float tolerance (the fit sums floats,
    so bit-equality is not the contract; agreement to 1e-6 relative is).

Usage: python tools/embed_scale.py [rows] [n_cores] [n4_cores]
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

DIM = 64
OUT_DIM = 16
K_PCA = 8
SEED = 42


def synth_embeddings(spark, rows: int):
    """Deterministic corpus: coordinate j of vec i =
    (xxhash64(i*DIM+j, seed) mod 2001 - 1000)/1000 — a pure codegen
    expression of the row id, so every partitioning of [0, rows) yields
    the same multiset without storing anything."""
    from pyspark.sql import functions as F

    ids = spark.range(rows).withColumnRenamed("id", "vec_id")
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (
            F.pmod(
                F.xxhash64(F.col("vec_id") * DIM + j, F.lit(SEED)), F.lit(2001)
            ).cast("double")
            - 1000.0
        )
        / 1000.0,
    )
    return ids.withColumn("embedding", vec)


def run_worker(cores: int, rows: int) -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from autoprepad_spark.operators import similarity as SIM
    from autoprepad_spark.operators import spectral as SP
    from autoprepad_spark.session import get_spark

    os.environ.setdefault("SPARK_JAVA_OPTS", "-XX:+UseG1GC")
    spark = get_spark(f"embed-scale-{cores}", cores=cores,
                      shuffle_partitions=max(cores, 8))
    em = synth_embeddings(spark, rows).repartition(32).cache()
    em.count()  # materialize outside the timed phases

    t0 = time.monotonic()
    proj = SIM.jl_project(
        em, out_dim=OUT_DIM, dim=DIM, seed=SEED, out_col="pv",
        family="md5int",
    )
    # order-free exact checksum of every projected coordinate: the sum
    # of exact integers is the same under any partitioning
    agg = proj.select(
        F.sum(F.aggregate("pv", F.lit(0.0), lambda a, x: a + x)).alias("s")
    ).collect()[0]
    project_s = time.monotonic() - t0
    proj_sum = int(agg["s"])

    t0 = time.monotonic()
    model = SP.fit_pca(em, "embedding", k=K_PCA, dim=DIM, fanin=32)
    fit_s = time.monotonic() - t0

    t0 = time.monotonic()
    q = em.filter(F.col("vec_id") < 16)
    topk = SIM.jl_topk(
        em, q, k=5, out_dim=OUT_DIM, dim=DIM, seed=SEED, family="md5int"
    ).select("query_id", "neighbor_id", "cos_sim").collect()
    topk_s = time.monotonic() - t0
    h = hashlib.sha256()
    for r in sorted((r["query_id"], r["neighbor_id"], r["cos_sim"]) for r in topk):
        h.update(repr(r).encode())

    print(json.dumps({
        "cores": cores,
        "rows": rows,
        "project_sec": round(project_s, 3),
        "project_rows_per_sec": round(rows / project_s, 1),
        "proj_sum": proj_sum,
        "fit_sec": round(fit_s, 3),
        "fit_rows_per_sec": round(rows / fit_s, 1),
        "evals": [round(v, 8) for v in model.explained_variance],
        "topk_sec": round(topk_s, 3),
        "topk_hash": h.hexdigest()[:16],
    }))


def main(rows: int, n_cores: int, n4_cores: int) -> None:
    results = {}
    for cores in (n_cores, n4_cores):
        cmd = [sys.executable, os.path.abspath(__file__), "--worker", str(cores), str(rows)]
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
    evals_ok = all(
        abs(a - b) <= 1e-6 * max(abs(a), 1e-9)
        for a, b in zip(rn["evals"], rn4["evals"])
    )
    print(json.dumps({
        "metric": f"embed_scaling_local{n_cores}_vs_local{n4_cores}",
        "rows": rows,
        "eff_project": round(
            rn4["project_rows_per_sec"] / rn["project_rows_per_sec"] / ratio, 3
        ),
        "eff_fit": round(
            rn4["fit_rows_per_sec"] / rn["fit_rows_per_sec"] / ratio, 3
        ),
        "topk_sec": {str(n_cores): rn["topk_sec"], str(n4_cores): rn4["topk_sec"]},
        "jl_exact_identical": (
            rn["proj_sum"] == rn4["proj_sum"]
            and rn["topk_hash"] == rn4["topk_hash"]
        ),
        "pca_evals_equal_1e6": evals_ok,
        "n": rn, "n4": rn4,
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        run_worker(int(sys.argv[2]), int(sys.argv[3]))
    else:
        rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
        n4 = int(sys.argv[3]) if len(sys.argv) > 3 else 16
        main(rows, n, n4)
