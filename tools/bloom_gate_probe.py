"""Measure the Bloom gate on the incremental exact pass.

Question: with a persisted history Bloom filter
(functions/sketches.py), how much of the exact shard-vs-history pass
do definite-new rows skip, versus the already-shipped broadcast
prefilter alone?

Setup: history of H unique docs (content-hash index persisted to
parquet), shard of S docs containing DUP×S exact copies of history
rows; both generated deterministically with codegen expressions. Each
mode runs in a FRESH process at a fixed core count and materializes
BOTH outputs of split_exact_against_index (fresh count + dropped
count), reporting wall time and cumulative shuffle-write bytes (UI
REST, same metric as dedup_scale.py). The gated mode also times the
one-off bloom build (one pass over the index + a bounded register
collect) — in production that cost amortizes across shards because
registers merge incrementally (bloom_merge) instead of refitting.

What the gate can and cannot save: the history INDEX is still scanned
once either way (the semi-join that implements the prefilter reads
it); the bloom removes the other-side costs that scale with the SHARD
— the broadcast of |shard| distinct hashes (now only possible members:
true dups + FPR), and the anti/semi hash-join probe work for the ~98%
of rows that are definitely new (they take one scan-level codegen
predicate instead). Outputs are hash-compared across modes: the gate
must not change a single row.

Usage: python tools/bloom_gate_probe.py [H_rows] [S_rows] [cores]
Internal: --worker mode cores
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H_ROWS = int(os.environ.get("BLOOMGATE_H", 4_000_000))
S_ROWS = int(os.environ.get("BLOOMGATE_S", 1_000_000))
DUP = 0.02
CORES = 8
FPR = 0.01


def _paths() -> tuple[str, str]:
    base = os.environ.get("SPARK_BENCH_TMP", "/tmp")
    return (
        os.path.join(base, f"bloomgate_hist_{H_ROWS}"),
        os.path.join(base, f"bloomgate_shard_{S_ROWS}"),
    )


def run_gen() -> None:
    from pyspark.sql import functions as F

    from autoprepad_spark.operators.incremental import content_hash
    from autoprepad_spark.session import get_spark

    hist_p, shard_p = _paths()
    spark = get_spark("bloomgate-gen", cores=32)
    history = spark.range(H_ROWS).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("history document "),
            F.col("id").cast("string"),
            F.lit(" body "),
            F.conv((F.col("id") * 2654435761).cast("string"), 10, 16),
        ).alias("text"),
    )
    # persist the content-hash INDEX (the production artifact), not text
    history.select(
        "doc_id", content_hash("text").alias("content_hash")
    ).write.mode("overwrite").parquet(hist_p)
    dup_mod = int(1 / DUP)
    shard = spark.range(S_ROWS).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.when(
            F.col("id") % dup_mod == 0,
            # exact copy of a deterministic history row
            F.concat(
                F.lit("history document "),
                ((F.col("id") * 7919) % H_ROWS).cast("string"),
                F.lit(" body "),
                F.conv(
                    (((F.col("id") * 7919) % H_ROWS) * 2654435761).cast("string"),
                    10,
                    16,
                ),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("fresh shard document "),
                F.col("id").cast("string"),
                F.lit(" body "),
                F.conv((F.col("id") * 104729).cast("string"), 10, 16),
            )
        )
        .alias("text"),
    )
    shard.write.mode("overwrite").parquet(shard_p)


def _shuffle_write_bytes(spark) -> int | None:
    import urllib.request

    try:
        ui = spark.sparkContext.uiWebUrl
        apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
        app = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
        )
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return None


def run_worker(mode: str, cores: int) -> None:
    from pyspark.sql import functions as F

    from autoprepad_spark.functions import sketches as S
    from autoprepad_spark.operators import incremental as INC
    from autoprepad_spark.session import get_spark

    os.environ.setdefault("SPARK_JAVA_OPTS", "-XX:+UseG1GC")
    hist_p, shard_p = _paths()
    spark = get_spark(
        f"bloomgate-{mode}",
        cores=cores,
        shuffle_partitions=cores,
        extra_conf={"spark.ui.enabled": "true"},
    )
    index = spark.read.parquet(hist_p)
    shard = spark.read.parquet(shard_p)

    bloom = None
    bloom_fit_s = 0.0
    if mode == "gated":
        t0 = time.monotonic()
        m_bits, k = S.bloom_size(H_ROWS, FPR)
        bloom = S.bloom_bytes(
            S.bloom_registers(index, "content_hash", m_bits=m_bits, k=k),
            m_bits, k=k,
        )
        bloom_fit_s = time.monotonic() - t0

    sw0 = _shuffle_write_bytes(spark)
    t0 = time.monotonic()
    if mode == "gated":
        m_bits, k = S.bloom_size(H_ROWS, FPR)
        fresh, dropped = INC.split_exact_against_index(
            shard, index, history_bloom=bloom, bloom_k=k
        )
    else:
        fresh, dropped = INC.split_exact_against_index(shard, index)
    # order-insensitive output hashes — the gate must not move a row
    fh = fresh.select(
        F.bit_xor(F.xxhash64("doc_id", "content_hash")).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    dh = dropped.select(
        F.bit_xor(F.xxhash64("doc_id", "reason")).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    wall = time.monotonic() - t0
    sw1 = _shuffle_write_bytes(spark)
    print(
        "RESULT "
        + json.dumps(
            {
                "mode": mode,
                "cores": cores,
                "wall_s": round(wall, 2),
                "bloom_fit_s": round(bloom_fit_s, 2),
                "bloom_mb": round(len(bloom) / 1e6, 2) if bloom else 0.0,
                "shuffle_mb": (
                    round((sw1 - sw0) / 1e6, 1)
                    if sw0 is not None and sw1 is not None
                    else None
                ),
                "fresh_n": fh["n"],
                "fresh_hash": fh["h"],
                "dropped_n": dh["n"],
                "dropped_hash": dh["h"],
            }
        )
    )


def main(cores: int) -> None:
    env = dict(os.environ)
    if not all(os.path.isdir(p) for p in _paths()):
        subprocess.run(
            [sys.executable, __file__, "--gen"], check=True, env=env
        )
    out = {}
    for mode in ("ungated", "gated"):
        r = subprocess.run(
            [sys.executable, __file__, "--worker", mode, str(cores)],
            check=True,
            env=env,
            capture_output=True,
            text=True,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("RESULT ")][-1]
        out[mode] = json.loads(line[len("RESULT "):])
        print(line)
    same = (
        out["gated"]["fresh_hash"] == out["ungated"]["fresh_hash"]
        and out["gated"]["dropped_hash"] == out["ungated"]["dropped_hash"]
        and out["gated"]["fresh_n"] == out["ungated"]["fresh_n"]
        and out["gated"]["dropped_n"] == out["ungated"]["dropped_n"]
    )
    print(
        json.dumps(
            {
                "H": H_ROWS,
                "S": S_ROWS,
                "dup_rate": DUP,
                "identical_outputs": same,
                "speedup": round(
                    out["ungated"]["wall_s"] / out["gated"]["wall_s"], 2
                ),
            }
        )
    )


if __name__ == "__main__":
    if "--gen" in sys.argv:
        run_gen()
    elif "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        run_worker(sys.argv[i + 1], int(sys.argv[i + 2]))
    else:
        if len(sys.argv) > 1:
            os.environ["BLOOMGATE_H"] = sys.argv[1]
            H_ROWS = int(sys.argv[1])
        if len(sys.argv) > 2:
            os.environ["BLOOMGATE_S"] = sys.argv[2]
            S_ROWS = int(sys.argv[2])
        main(int(sys.argv[3]) if len(sys.argv) > 3 else CORES)
