"""Token-domain dedup N vs 4N scaling evidence.

Applies the bench.py --scaling methodology (same deterministic input,
fresh taskset-pinned processes at two parallelism levels, outputs must
be hash-identical, efficiency = throughput ratio / core ratio) to the
TOKEN near-dup pipeline of operators/token_ops.py:

    token table (datagen.generate_tokens, violations off)
      + deterministic one-substitution twins (same rule as
        __spark_entry__.q_token_minhash_dedup, so expected pairs are
        known: one per twin)
      -> token 5-gram hashes (allocation-free element_at form)
      -> MinHash signatures (codegen explode + map-side-combined agg)
      -> LSH banding (16 bands x 2 rows, bucket cap active)
      -> exact-Jaccard verification over the token-gram index

This measures the module docstring's core claim — integer-domain gram
hashing removes the per-gram allocation that capped the TEXT shingle
path's core scaling — on the same host and methodology that measured
the text numbers (word_shingle_hashes docstring; tools/dedup_scale.py).

Usage:
    python tools/token_scale.py [rows] [n_cores] [n4_cores]
Internal: --gen rows | --worker cores rows
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

SEED = 11


def _path(rows: int) -> str:
    return os.path.join(
        os.environ.get("SPARK_BENCH_TMP", "/tmp"), f"token_scale_{rows}"
    )


def run_gen(rows: int) -> None:
    from autoprepad_spark.session import get_spark
    from autoprepad_spark.datagen import generate_tokens

    spark = get_spark("token-scale-gen", cores=32)
    if not os.path.isdir(_path(rows)):
        generate_tokens(
            spark, rows, seed=SEED, n_parts=32, inject_violations=False
        ).write.mode("overwrite").parquet(_path(rows))


def run_worker(cores: int, rows: int) -> None:
    from pyspark.sql import functions as F

    from autoprepad_spark.session import get_spark
    from autoprepad_spark.operators import token_ops as TO
    from autoprepad_spark.operators import dedup as DD

    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    # same task-granularity discipline as tools/dedup_scale.py (>=4
    # waves, 16MB scan splits, 8x-slots shuffles) so per-slot task
    # coarseness matches across levels
    spark = get_spark(
        f"token-scale-{cores}",
        cores=cores,
        shuffle_partitions=max(8 * cores, 32),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            "spark.default.parallelism": str(4 * cores),
        },
    )
    base = spark.read.parquet(_path(rows)).select("doc_id", "tokens")
    t_col = F.col("tokens")
    mut = F.concat(
        F.slice(t_col, 1, 49),
        F.array(F.lit(50256) - F.element_at(t_col, 50)),
        F.slice(t_col, 51, F.size(t_col) - 50),
    )
    nid = F.substring("doc_id", 5, 12).cast("long")
    twins = base.filter((nid % 250 == 11) & (F.size("tokens") >= 100)).select(
        F.concat("doc_id", F.lit("-v2")).alias("doc_id"), mut.alias("tokens")
    )
    docs = base.unionByName(twins)

    # warmup: JIT the gram/min codegen loops on a slice
    warm = base.filter(nid < 50_000)
    DD.minhash_signatures(
        warm, id_col="doc_id", shingles=TO.token_gram_index(warm, n=5)
    ).count()

    best, stages_best, n_pairs, out_hash = float("inf"), None, 0, ""
    for _ in range(int(os.environ.get("TOKEN_SCALE_REPEATS", "2"))):
        spark.catalog.clearCache()
        stages = {}
        t0 = t = time.perf_counter()
        grams = TO.token_gram_index(docs, n=5)
        sigs = DD.minhash_signatures(
            docs, id_col="doc_id", num_hashes=32, shingles=grams
        ).cache()
        sigs.count()
        stages["signatures"] = round(time.perf_counter() - t, 2)

        t = time.perf_counter()
        cands = DD.minhash_candidates(
            sigs, id_col="doc_id", bands=16, num_hashes=32
        ).cache()
        cands.count()
        stages["candidates"] = round(time.perf_counter() - t, 2)

        t = time.perf_counter()
        pairs = TO.token_minhash_pairs(
            docs, n=5, num_hashes=32, bands=16, threshold=0.9,
            grams=grams,
        )
        got = sorted(
            (r["id_a"], r["id_b"], round(r["jaccard"], 6))
            for r in pairs.collect()
        )
        stages["verify"] = round(time.perf_counter() - t, 2)
        elapsed = time.perf_counter() - t0
        sigs.unpersist()
        cands.unpersist()
        if elapsed < best:
            best, stages_best, n_pairs = elapsed, stages, len(got)
            out_hash = hashlib.sha256(str(got).encode()).hexdigest()[:16]

    n_docs = docs.count()
    print(json.dumps({
        "cores": cores, "rows": n_docs, "elapsed_sec": round(best, 2),
        "rows_per_sec": round(n_docs / best, 1), "stages": stages_best,
        "n_pairs": n_pairs, "pairs_hash": out_hash,
    }))


def run_scaling(rows: int, n_cores: int, n4_cores: int) -> None:
    subprocess.run(
        [sys.executable, __file__, "--gen", str(rows)],
        capture_output=True, text=True, cwd=REPO,
    )
    results = {}
    for cores in (n_cores, n4_cores):
        cmd = [sys.executable, __file__, "--worker", str(cores), str(rows)]
        if os.path.exists("/usr/bin/taskset"):
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        p = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(p.stdout[-3000:], p.stderr[-3000:], file=sys.stderr)
            raise SystemExit(f"worker cores={cores} failed")
        results[cores] = json.loads(line[-1])
        print(f"# {results[cores]}", file=sys.stderr)
    rn, rn4 = results[n_cores], results[n4_cores]
    eff = (rn4["rows_per_sec"] / rn["rows_per_sec"]) / (n4_cores / n_cores)
    print(json.dumps({
        "metric": f"token_dedup_scaling_{n_cores}_vs_{n4_cores}",
        "value": round(eff, 3), "unit": "ratio", "rows": rn["rows"],
        "identical": rn["pairs_hash"] == rn4["pairs_hash"]
        and rn["n_pairs"] == rn4["n_pairs"],
        "n": rn, "n4": rn4,
    }))


if __name__ == "__main__":
    if sys.argv[1] == "--gen":
        run_gen(int(sys.argv[2]))
    elif sys.argv[1] == "--worker":
        run_worker(int(sys.argv[2]), int(sys.argv[3]))
    else:
        rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
        n4 = int(sys.argv[3]) if len(sys.argv) > 3 else 16
        run_scaling(rows, n, n4)
