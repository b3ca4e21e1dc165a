"""Corpus-cleaning (clean_corpus) N vs 4N scaling evidence.

Same two-parallelism-level methodology as bench.py --scaling and
dedup_scale.py, applied to the one-scan cleaning plan: exact dedup +
length gates + top-bigram repetition gate + the CCNet-style bigram-LM
perplexity gate (operators/lm_quality.py), composed by
plans.corpus.clean_corpus into a single tagged pass. The LM is fitted
on a fixed 100k-doc slice and the ppl threshold is derived as that
slice's exact 80th percentile, so the whole configuration is
deterministic and must produce identical audits/hashes at every
parallelism level.

Usage:
    python tools/corpus_scale.py [rows] [n_cores] [n4_cores]
Internal: --worker cores rows
Reuses dedup_scale.py's deterministic corpus (generated on demand).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.dedup_scale import _path  # noqa: E402

FIT_DOCS = 100_000


def run_worker(cores: int, rows: int) -> None:
    from pyspark.sql import functions as F

    from autoprepad_spark.operators import lm_quality as LM
    from autoprepad_spark.plans.corpus import clean_corpus
    from autoprepad_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    os.environ.setdefault("SPARK_JAVA_OPTS", "-XX:+UseG1GC")
    spark = get_spark(f"corpus-scale-{cores}", cores=cores)
    docs = spark.read.parquet(_path(rows))
    fit_slice = docs.filter(F.col("doc_id") < FIT_DOCS).cache()

    # warmup: JIT the codegen'd regex/HOF loops on a small slice
    warm_model = LM.fit_bigram_lm(
        fit_slice.limit(5_000), max_vocab=512, max_bigrams=4_096
    )
    c, a = clean_corpus(
        docs.filter(F.col("doc_id") < 20_000),
        min_chars=220, max_chars=480, max_top_bigram_frac=0.5,
        lm_model=warm_model, max_ppl=1e9,
    )
    a.collect(); c.count()

    t = time.perf_counter()
    model = LM.fit_bigram_lm(
        fit_slice, max_vocab=4_096, min_bigram_count=2, max_bigrams=65_536
    )
    cut = LM.perplexity(fit_slice, model).agg(
        F.expr("percentile(ppl, 0.8)").alias("q")
    ).collect()[0]["q"]
    t_fit = round(time.perf_counter() - t, 2)
    fit_slice.unpersist()

    t = time.perf_counter()
    clean, audit = clean_corpus(
        docs,
        exact_dedup=True,
        min_chars=220,
        max_chars=480,
        max_top_bigram_frac=0.5,
        lm_model=model,
        max_ppl=cut,
    )
    audit_rows = {r["stage"]: r["n_docs"] for r in audit.collect()}
    r = clean.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.xxhash64(F.col("doc_id").cast("string")).cast("decimal(38,0)")
        ).alias("h"),
    ).collect()[0]
    t_clean = round(time.perf_counter() - t, 2)

    print(json.dumps({
        "cores": cores,
        "rows": rows,
        "fit_sec": t_fit,
        "ppl_cut": round(float(cut), 6),
        "clean_sec": t_clean,
        "docs_per_sec": round(rows / t_clean, 1),
        "audit": audit_rows,
        "n_kept": r["n"],
        "kept_hash": str(r["h"]),
    }))


def main(rows: int, n_cores: int, n4_cores: int) -> None:
    if not os.path.exists(os.path.join(_path(rows), "_SUCCESS")):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "dedup_scale.py"),
             "--gen", str(rows)],
            check=True, cwd=REPO,
        )
    results = {}
    for cores in (n_cores, n4_cores):
        cmd = [sys.executable, __file__, "--worker", str(cores), str(rows)]
        if os.path.exists("/usr/bin/taskset"):
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        p = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(p.stdout, p.stderr, file=sys.stderr)
            raise SystemExit(f"worker cores={cores} failed")
        results[cores] = json.loads(line[-1])
        print(f"# local[{cores}]: fit {results[cores]['fit_sec']}s, "
              f"clean {results[cores]['clean_sec']}s", file=sys.stderr)
    rn, rn4 = results[n_cores], results[n4_cores]
    eff = (rn4["docs_per_sec"] / rn["docs_per_sec"]) / (n4_cores / n_cores)
    identical = all(
        rn[k] == rn4[k] for k in ("audit", "n_kept", "kept_hash", "ppl_cut")
    )
    print(json.dumps({
        "metric": f"corpus_clean_scaling_local{n_cores}_vs_local{n4_cores}",
        "value": round(eff, 3),
        "unit": "ratio",
        "rows": rows,
        "n": rn, "n4": rn4,
        "outputs_identical": identical,
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        run_worker(int(sys.argv[2]), int(sys.argv[3]))
    else:
        rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
        n, n4 = (
            (int(sys.argv[2]), int(sys.argv[3]))
            if len(sys.argv) > 3
            else (2, 8)
        )
        main(rows, n, n4)
