"""BPE tokenizer N vs 4N scaling evidence (the tokens axis).

Same two-parallelism-level methodology as bench.py --scaling /
dedup_scale.py / corpus_scale.py, applied to the tokenizer:

  fit phase   — fit_bpe on a fixed 100k-doc slice (distributed
                word-count agg + driver merge loop; timed separately,
                it is a one-off per tokenizer version),
  encode phase— bpe_encode over the FULL corpus + one agg computing
                total token count and an order-independent xxhash sum
                of the per-doc token arrays (so outputs must be
                IDENTICAL across parallelism levels, not just equal
                in volume).

Throughput is reported in emitted BPE tokens/sec. The encode plan is a
bare scan + ArrowEvalPython + partial agg — no shuffle beyond the final
single-row reduce — so efficiency measures the Arrow exchange + Python
scoring path under core scaling, the same allocation-rate-bound regime
as the cleaning family.

The dedup corpus's "w4732"-style words would pre-tokenize into single
chars (digits are their own word class), leaving BPE a trivial
~17-merge model; the worker therefore maps digits to letters with one
codegen ``translate`` ("w4732" -> "wehdc"), giving ~5000 multi-char
word types and a real 2000-merge model, so the encode path does
genuine merge work per word type (memoized — the Zipf case).

Usage:
    python tools/bpe_scale.py [rows] [n_cores] [n4_cores]
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
NUM_MERGES = 2_000


def run_worker(cores: int, rows: int) -> None:
    from pyspark.sql import functions as F

    from autoprepad_spark.operators import tokenizer as T
    from autoprepad_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    os.environ.setdefault("SPARK_JAVA_OPTS", "-XX:+UseG1GC")
    spark = get_spark(f"bpe-scale-{cores}", cores=cores)
    docs = spark.read.parquet(_path(rows)).withColumn(
        "text", F.translate("text", "0123456789", "abcdefghij")
    )
    fit_slice = docs.filter(F.col("doc_id") < FIT_DOCS)

    # warmup: JIT codegen + fork Arrow workers on a small slice
    warm = T.fit_bpe(fit_slice.limit(2_000), num_merges=50)
    T.bpe_encode(docs.filter(F.col("doc_id") < 20_000), warm).agg(
        F.sum(F.size("tokens"))
    ).collect()

    t = time.perf_counter()
    model = T.fit_bpe(fit_slice, num_merges=NUM_MERGES)
    t_fit = round(time.perf_counter() - t, 2)

    t = time.perf_counter()
    r = (
        T.bpe_encode(docs, model)
        .agg(
            F.sum(F.size("tokens")).alias("n_tok"),
            F.sum(
                F.xxhash64(F.col("tokens").cast("string")).cast(
                    "decimal(38,0)"
                )
            ).alias("h"),
        )
        .collect()[0]
    )
    t_enc = round(time.perf_counter() - t, 2)

    print(json.dumps({
        "cores": cores,
        "rows": rows,
        "fit_sec": t_fit,
        "n_merges": len(model["merges"]),
        "vocab_size": len(model["vocab"]),
        "encode_sec": t_enc,
        "n_tokens": r["n_tok"],
        "tokens_per_sec": round(r["n_tok"] / t_enc, 1),
        "tokens_hash": str(r["h"]),
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
              f"encode {results[cores]['encode_sec']}s "
              f"({results[cores]['tokens_per_sec']:.0f} tok/s)",
              file=sys.stderr)
    rn, rn4 = results[n_cores], results[n4_cores]
    eff = (rn4["tokens_per_sec"] / rn["tokens_per_sec"]) / (
        n4_cores / n_cores
    )
    identical = all(
        rn[k] == rn4[k]
        for k in ("n_tokens", "tokens_hash", "n_merges", "vocab_size")
    )
    print(json.dumps({
        "metric": f"bpe_encode_scaling_local{n_cores}_vs_local{n4_cores}",
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
        rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
        n, n4 = (
            (int(sys.argv[2]), int(sys.argv[3]))
            if len(sys.argv) > 3
            else (2, 8)
        )
        main(rows, n, n4)
