"""DSIR hash-family A/B + N vs 4N scaling evidence.

Same methodology as dedup_scale.py / bpe_scale.py: taskset-pinned
fresh worker processes at two core counts over the SAME deterministic
corpus (reuses dedup_scale's generator/parquet), per-phase timing, and
an order-insensitive output hash that must be IDENTICAL across
parallelism levels (weights are pure row functions, so any difference
is a determinism bug).

Phases per worker:
  fit    — fit_hashed_ngrams over the full corpus (raw distribution)
           plus a 50k-doc slice (target), for the given hash family
  score  — dsir_log_weights over the full corpus + one agg
           (count, bit_xor of xxhash64(doc_id, weight-as-string))
  select — Gumbel top-(n/10) with a count + id-hash

Families A/B'd: ``hash64`` (integer-domain xxhash64 over per-word hash
longs — the default) vs ``md5`` (per-gram string md5 — the
oracle-portable family). The DSIR selection itself is family-agnostic;
this measures whether the no-per-gram-allocation rule that governs the
shingle path (dedup.word_shingle_hashes) binds here too.

Usage: python tools/dsir_scale.py [rows] [n_cores] [n4_cores]
Internal: --worker method cores rows
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROWS = 1_000_000
BUCKETS = 10_000


def _corpus_path(rows: int) -> str:
    from tools import dedup_scale as DS

    return DS._path(rows)


def run_worker(method: str, cores: int, rows: int) -> None:
    from pyspark.sql import functions as F

    from autoprepad_spark.operators import dsir
    from autoprepad_spark.session import get_spark

    os.environ.setdefault("SPARK_JAVA_OPTS", "-XX:+UseG1GC")
    spark = get_spark(
        f"dsir-{method}-{cores}", cores=cores, shuffle_partitions=cores
    )
    docs = spark.read.parquet(_corpus_path(rows))
    # deterministic target slice: every-20th doc_id below a fixed bound
    # (exactly 50k docs when rows >= 1M). A bare limit(50_000) is NOT
    # guaranteed to pick the same rows at different core counts, which
    # would let the lambda table differ between the N and 4N workers
    # and spuriously fail the cross-parallelism identity check.
    target = docs.filter(
        (F.col("doc_id") % 20 == 0) & (F.col("doc_id") < 1_000_000)
    )

    t0 = time.monotonic()
    t_fit = dsir.fit_hashed_ngrams(
        target, buckets=BUCKETS, method=method
    ).cache()
    q_fit = dsir.fit_hashed_ngrams(docs, buckets=BUCKETS, method=method).cache()
    t_fit.count(), q_fit.count()
    fit_s = time.monotonic() - t0

    t0 = time.monotonic()
    scored = dsir.dsir_log_weights(
        docs, t_fit, q_fit, buckets=BUCKETS, method=method
    )
    agg = scored.select(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(
            F.xxhash64("doc_id", F.col("dsir_logw").cast("string"))
        ).alias("h"),
    ).collect()[0]
    score_s = time.monotonic() - t0

    t0 = time.monotonic()
    kept = dsir.dsir_select(scored, rows // 10)
    ka = kept.select(
        F.count(F.lit(1)).alias("n"), F.bit_xor(F.xxhash64("doc_id")).alias("h")
    ).collect()[0]
    select_s = time.monotonic() - t0

    print(
        json.dumps(
            {
                "method": method,
                "cores": cores,
                "fit_s": round(fit_s, 1),
                "score_s": round(score_s, 1),
                "select_s": round(select_s, 1),
                "docs_per_sec_score": round(rows / score_s, 1),
                "n": agg["n"],
                "weights_hash": agg["h"],
                "kept_n": ka["n"],
                "kept_hash": ka["h"],
            }
        )
    )


def main(rows: int, n_cores: int, n4_cores: int) -> None:
    from tools import dedup_scale as DS

    if not os.path.exists(os.path.join(_corpus_path(rows), "_SUCCESS")):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "dedup_scale.py"),
             "--gen", str(rows)],
            check=True, cwd=REPO,
        )
    results: dict[tuple[str, int], dict] = {}
    for method in ("hash64", "md5"):
        for cores in (n_cores, n4_cores):
            cmd = [
                sys.executable, __file__, "--worker", method, str(cores),
                str(rows),
            ]
            if os.path.exists("/usr/bin/taskset"):
                cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
            p = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
            lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
            if not lines:
                print(p.stdout[-3000:], p.stderr[-3000:], file=sys.stderr)
                raise SystemExit(f"worker {method}/{cores} failed")
            results[(method, cores)] = json.loads(lines[-1])
            print("RESULT " + lines[-1])
    for method in ("hash64", "md5"):
        a, b = results[(method, n_cores)], results[(method, n4_cores)]
        eff = (b["docs_per_sec_score"] / a["docs_per_sec_score"]) / (
            n4_cores / n_cores
        )
        ident = (
            a["weights_hash"] == b["weights_hash"]
            and a["kept_hash"] == b["kept_hash"]
            and a["n"] == b["n"]
            and a["kept_n"] == b["kept_n"]
        )
        print(
            json.dumps(
                {
                    "method": method,
                    "rows": rows,
                    "score_eff": round(eff, 3),
                    "identical": ident,
                }
            )
        )


if __name__ == "__main__":
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        run_worker(sys.argv[i + 1], int(sys.argv[i + 2]), int(sys.argv[i + 3]))
    else:
        rows = int(sys.argv[1]) if len(sys.argv) > 1 else ROWS
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
        n4 = int(sys.argv[3]) if len(sys.argv) > 3 else 16
        main(rows, n, n4)
