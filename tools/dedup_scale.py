"""Dedup-family N vs 4N scaling evidence.

The north rule's scaling criterion is proven on the validation suite
(bench.py --scaling); this tool applies the SAME two-parallelism-level
methodology to the dedup pipeline — the training-data operator family
whose 100-TB behavior the round briefs grade — so its scale story is
measured, not argued:

    corpus -> exact_duplicates (md5 hash-groupBy)
           -> minhash signatures (map-only: per-row array mins, no
              explode/shuffle/index cache — the plan shape that scales;
              the shared-index aggregation variant measured 1.0x from
              4x cores here, capped by the 120M-row index cache write)
           -> LSH banding (bucket-size cap active, production default)
           -> exact-Jaccard verification, candidate-pruned BEFORE
              shingling (only ~|candidates| docs are ever exploded)
           -> connected components -> keep-one-per-cluster

Usage:
    python tools/dedup_scale.py [rows] [n_cores] [n4_cores]
    python tools/dedup_scale.py --inc [rows] [n_cores] [n4_cores]
Internal worker modes (mirrors bench.py): --gen rows | --worker cores rows
    | --inc-worker cores rows

--inc measures the INCREMENTAL (shard-vs-history) path of
operators/incremental.py: history = docs [0, 3/4*rows) indexed once;
shard = docs [5/8*rows, 7/8*rows) with ids remapped (+10^9), so HALF
the shard is an exact re-arrival of historical content and half is
fresh. Timed phases per parallelism level: (a) build_dedup_index over
the history, (b) dedup_against_index of the shard (exact anti-join
drops the re-arrivals BEFORE any shingling — the pass-ordering claim,
measured). Outputs must be hash-identical across levels.

The corpus is deterministic and parallelism-independent (chunk-seeded
mapInPandas, same pattern as datagen.generate_tokens): every 50th doc is
a near-duplicate of its predecessor (one word edited, true J ~ 0.9) and
every 100th an exact copy two back, so expected pair/cluster counts are
known. Workers are taskset-pinned fresh processes; outputs must be
hash-identical across parallelism levels.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from collections.abc import Iterator

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHUNK = 20_000
SEED = 99
VOCAB = 5_000


def _text_for(idx: int) -> str:
    import numpy as np

    if idx % 100 == 2:          # exact copy of idx-2
        return _text_for(idx - 2)
    edited = idx % 50 == 1      # near-dup of idx-1 (last word edited)
    base = idx - 1 if edited else idx
    rng = np.random.default_rng([SEED, base])
    n = 30 + int(base % 60)
    words = [f"w{v}" for v in rng.integers(0, VOCAB, n)]
    if edited:
        words[-1] = "edited"
    return " ".join(words)


def generate_docs(spark, n_rows: int, n_parts: int = 32):
    import pandas as pd
    from pyspark.sql import functions as F

    n_chunks = (n_rows + CHUNK - 1) // CHUNK
    chunks = spark.range(n_chunks).repartition(n_parts, "id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for cid in b["id"]:
                lo, hi = cid * CHUNK, min(n_rows, (cid + 1) * CHUNK)
                yield pd.DataFrame(
                    {
                        "doc_id": range(lo, hi),
                        "text": [_text_for(i) for i in range(lo, hi)],
                    }
                )

    return chunks.mapInPandas(gen, "doc_id long, text string").select(
        F.col("doc_id"), F.col("text")
    )


def _path(rows: int) -> str:
    return os.path.join(
        os.environ.get("SPARK_BENCH_TMP", "/tmp"), f"dedup_docs_{rows}"
    )


def run_gen(rows: int) -> None:
    from autoprepad_spark.session import get_spark

    spark = get_spark("dedup-scale-gen", cores=32)
    generate_docs(spark, rows).write.mode("overwrite").parquet(_path(rows))


def run_worker(cores: int, rows: int, jvm_workers: int | None = None) -> None:
    from autoprepad_spark.session import get_spark
    from autoprepad_spark.operators import dedup as DD
    from pyspark.sql import functions as F

    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    os.environ.setdefault("SPARK_JAVA_OPTS", "-XX:+UseG1GC")
    # Task-granularity tuning (round 4, measured): the level-8 cross-JVM
    # run's stage metrics showed util 0.54-0.89 on every big stage with
    # GC ~0, fetch-wait ~0 and cpu==run — slots were IDLE, not slow. Two
    # coarseness sources: (a) the scan bin-packed 8M docs into 20 splits
    # (2.5 waves of 8 -> last-wave tail), and (b) AQE parallelismFirst
    # coalesces post-shuffle stages down to default.parallelism (=slots)
    # — exactly ONE wave, the configuration most sensitive to task-time
    # variance (E[max of k] grows with k, so the BIGGER level loses
    # more, depressing measured scaling). Fix = the standard cluster
    # guidance, applied identically at both levels so per-slot
    # granularity matches: >=4 waves via a 4x-slots AQE floor and 16 MB
    # scan splits (scan tasks carry no exchange, so finer is nearly
    # free; shuffle tasks DO pay per-task setup — a 16x-slots shuffle
    # A/B measured util 0.57-0.66 on the small post-shuffle stages, so
    # shuffles get 8x slots). DEDUP_COARSE=1 reproduces the old
    # defaults.
    coarse = bool(os.environ.get("DEDUP_COARSE"))
    slots = jvm_workers or cores
    gran_conf = {} if coarse else {
        "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        "spark.default.parallelism": str(4 * slots),
    }
    gran_shuffle = None if coarse else max(8 * slots, 32)
    if jvm_workers:
        # cross-JVM variant (VERDICT r3 next-round #4): N single-core
        # executor JVMs instead of N threads in one JVM — separate heaps
        # = separate allocation domains, the sandbox analog of real
        # executors. Tests the claim that the dedup family's sub-0.8
        # same-JVM thread scaling is allocation-rate contention, not a
        # plan defect: per-executor resources are IDENTICAL across the
        # two cluster sizes (1 core + 8g each), only the executor COUNT
        # changes, exactly like growing a real cluster.
        spark = get_spark(
            f"dedup-jvm-{jvm_workers}",
            cores=jvm_workers,
            shuffle_partitions=gran_shuffle,
            master=f"local-cluster[{jvm_workers},1,9216]",
            extra_conf={
                **gran_conf,
                "spark.executor.memory": "8g",
                # stage-metric attribution reads the UI REST endpoint
                "spark.ui.enabled": (
                    "true" if os.environ.get("DEDUP_STAGE_METRICS") else "false"
                ),
                "spark.executor.extraJavaOptions": os.environ["SPARK_JAVA_OPTS"],
                # tasks run in the executor JVMs here — the driver only
                # schedules, so it doesn't need the 48g the thread-mode
                # (driver==executor) runs reserve; 8 workers x (8g+overhead)
                # + a 48g driver would overshoot the host's 128 GiB
                "spark.driver.memory": "8g",
            },
        )
    else:
        spark = get_spark(
            f"dedup-scale-{cores}",
            cores=cores,
            shuffle_partitions=gran_shuffle,
            extra_conf=gran_conf or None,
        )
    docs = spark.read.parquet(_path(rows))
    n_docs = docs.count()

    # warmup pass on a slice: JIT the codegen'd shingle/minhash loops
    warm = docs.filter(F.col("doc_id") < 50_000)
    DD.exact_duplicates(warm).count()
    DD.verify_pairs_jaccard(
        warm,
        DD.minhash_candidates(DD.minhash_signatures(warm).cache()),
        threshold=0.8,
    ).count()

    best = float("inf")
    stages_best = None
    for _ in range(int(os.environ.get("DEDUP_REPEATS", "2"))):
        spark.catalog.clearCache()
        stages = {}
        t0 = t = time.perf_counter()
        n_exact = DD.exact_duplicates(docs).count()
        stages["exact"] = round(time.perf_counter() - t, 2)

        t = time.perf_counter()
        # map-only signatures: per-row mins over the shingle array — no
        # explode, no shuffle, no index materialization
        sigs = DD.minhash_signatures(docs).cache()
        sigs.count()
        stages["minhash_sigs"] = round(time.perf_counter() - t, 2)

        t = time.perf_counter()
        # cached: the verify prune reads the candidate frame twice
        cands = DD.minhash_candidates(sigs).cache()  # bucket cap active
        # shingles built fresh INSIDE verify from the candidate-pruned
        # doc set (prune_index default): |candidates| docs exploded,
        # never the corpus
        pairs = DD.verify_pairs_jaccard(docs, cands, threshold=0.8).cache()
        n_pairs = pairs.count()
        cands.unpersist()
        stages["lsh_verify"] = round(time.perf_counter() - t, 2)

        t = time.perf_counter()
        kept = DD.keep_one_per_cluster(docs, pairs)
        agg = kept.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64(F.col("doc_id").cast("string")).cast("decimal(38,0)")
            ).alias("h"),
        ).collect()[0]
        stages["cluster_keep"] = round(time.perf_counter() - t, 2)

        elapsed = time.perf_counter() - t0
        if elapsed < best:
            best, stages_best = elapsed, stages
        for c in (sigs, pairs):
            c.unpersist()

    # optional per-stage attribution (UI REST): utilization = summed
    # task run time / (wall x slots) — separates "cores idle (tail /
    # scheduling)" from "cores busy but slower (contention)"
    if os.environ.get("DEDUP_STAGE_METRICS"):
        _dump_stage_metrics(spark, cores)

    print(json.dumps({
        "cores": cores,
        "rows": n_docs,
        "elapsed_sec": round(best, 3),
        "docs_per_sec": round(n_docs / best, 1),
        "n_exact_dup_groups": n_exact,
        "n_verified_pairs": n_pairs,
        "n_kept": agg["n"],
        "kept_hash": str(agg["h"]),
        "stages": stages_best,
    }))


def _dump_stage_metrics(spark, slots: int) -> None:
    """Per-stage run/CPU/GC attribution via the UI REST API (stderr).

    For each completed stage: wall (submission->completion), number of
    tasks, summed executorRunTime, executorCpuTime, jvmGcTime,
    shuffle-fetch wait, and utilization = runTime / (wall * slots).
    Low utilization => idle slots (task-granularity tail, scheduling
    delay); high utilization with runTime >> cpuTime => threads blocked
    (I/O, python exchange); cpuTime inflation across parallelism levels
    => per-cycle contention."""
    import urllib.request
    from datetime import datetime, timezone

    def _ts(s: str) -> float:
        return datetime.strptime(
            s, "%Y-%m-%dT%H:%M:%S.%f%Z"
        ).replace(tzinfo=timezone.utc).timestamp()

    try:
        ui = spark.sparkContext.uiWebUrl
        apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
        app = apps[0]["id"]
        stages = json.load(urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"
        ))
        rows = []
        for s in stages:
            try:
                wall = _ts(s["completionTime"]) - _ts(s["firstTaskLaunchedTime"])
            except (KeyError, ValueError):
                continue
            if wall <= 0:
                continue
            run_s = s.get("executorRunTime", 0) / 1e3
            rows.append({
                "stage": s["stageId"],
                "name": s.get("name", "")[:48],
                "tasks": s.get("numCompleteTasks", 0),
                "wall_s": round(wall, 2),
                "run_s": round(run_s, 1),
                "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 1),
                "gc_s": round(s.get("jvmGcTime", 0) / 1e3, 1),
                "fetch_wait_s": round(s.get("shuffleFetchWaitTime", 0) / 1e3, 1),
                "util": round(run_s / (wall * slots), 2),
            })
        rows.sort(key=lambda r: -r["run_s"])
        for r in rows[:20]:
            print("#STAGE " + json.dumps(r), file=sys.stderr)
    except Exception as e:  # diagnostics must never fail the bench
        print(f"#STAGE metrics unavailable: {e}", file=sys.stderr)


def _shuffle_write_bytes(spark) -> int | None:
    """Cumulative shuffle-write bytes across completed stages (UI REST
    API) — snapshot before/after a phase to get its exchanged bytes,
    the metric that predicts cluster (network-bound) behavior where
    local wall-time cannot."""
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


def run_inc_worker(cores: int, rows: int) -> None:
    from pyspark.sql import functions as F

    from autoprepad_spark.operators import incremental as INC
    from autoprepad_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    os.environ.setdefault("SPARK_JAVA_OPTS", "-XX:+UseG1GC")
    # UI on: _shuffle_write_bytes reads the stage metrics REST endpoint
    spark = get_spark(
        f"dedup-inc-{cores}",
        cores=cores,
        extra_conf={"spark.ui.enabled": "true"},
    )
    docs = spark.read.parquet(_path(rows))
    h_hi = rows * 3 // 4
    # DEDUP_SHARD_ROWS pins the shard size while `rows` grows the
    # history — the O(|shard|)-vs-O(|history|) exchanged-bytes claim is
    # tested by holding the shard fixed and doubling the history. The
    # window stays centered on h_hi so half the shard re-arrives
    # (matching the default 5/8..7/8 split at shard = rows/4).
    if os.environ.get("DEDUP_SHARD_ROWS"):
        shard_n = int(os.environ["DEDUP_SHARD_ROWS"])
        s_lo, s_hi = h_hi - shard_n // 2, h_hi + shard_n // 2
    else:
        s_lo, s_hi = rows * 5 // 8, rows * 7 // 8
    history = docs.filter(F.col("doc_id") < h_hi)
    shard = docs.filter(
        (F.col("doc_id") >= s_lo) & (F.col("doc_id") < s_hi)
    ).select((F.col("doc_id") + F.lit(1_000_000_000)).alias("doc_id"), "text")

    # warmup: JIT the codegen paths on a slice
    INC.dedup_against_index(
        shard.filter(F.col("doc_id") < 1_000_000_000 + s_lo + 20_000),
        INC.build_dedup_index(history.filter(F.col("doc_id") < 20_000)),
    )[1].count()

    idx_path = os.path.join(
        os.environ.get("SPARK_BENCH_TMP", "/tmp"), f"dedup_idx_{rows}_{cores}"
    )
    t = time.perf_counter()
    INC.build_dedup_index(history).write.mode("overwrite").parquet(idx_path)
    t_index = round(time.perf_counter() - t, 2)

    index = spark.read.parquet(idx_path)
    out = {}

    t_phase = [0.0]

    def dropped_sink(d):
        out["dropped"] = {
            r["reason"]: {"n": r["n"], "h": str(r["h"])}
            for r in d.groupBy("reason").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.xxhash64(F.col("doc_id").cast("string")).cast("decimal(38,0)")
                ).alias("h"),
            ).collect()
        }
        # phase split: run_shard_dedup materializes dropped first, kept
        # second — this timestamp is the boundary between the two
        out["dropped_phase_sec"] = round(time.perf_counter() - t_phase[0], 2)

    def kept_sink(k):
        r = k.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64(F.col("doc_id").cast("string")).cast("decimal(38,0)")
            ).alias("h"),
        ).collect()[0]
        out["n_kept"], out["kept_hash"] = r["n"], str(r["h"])

    sw0 = _shuffle_write_bytes(spark)
    t = t_phase[0] = time.perf_counter()
    INC.run_shard_dedup(
        shard,
        index,
        kept_sink=kept_sink,
        dropped_sink=dropped_sink,
        threshold=0.8,
        # A/B knob: measure the O(|history|)-exchange plan the
        # prefilter replaces
        prefilter_history=not os.environ.get("DEDUP_NO_PREFILTER"),
    )
    t_shard = round(time.perf_counter() - t, 2)
    sw1 = _shuffle_write_bytes(spark)
    shuffle_mb = (
        round((sw1 - sw0) / 1024 / 1024, 1) if sw0 is not None and sw1 is not None
        else None
    )

    import shutil

    shutil.rmtree(idx_path, ignore_errors=True)
    n_shard = s_hi - s_lo
    print(json.dumps({
        "cores": cores,
        "rows_history": h_hi,
        "rows_shard": n_shard,
        "index_build_sec": t_index,
        "shard_dedup_sec": t_shard,
        "dropped_phase_sec": out.get("dropped_phase_sec"),
        "shard_docs_per_sec": round(n_shard / t_shard, 1),
        "shard_shuffle_write_mb": shuffle_mb,
        "dropped": out["dropped"],
        "n_kept": out["n_kept"],
        "kept_hash": out["kept_hash"],
    }))


def main_inc(rows: int, n_cores: int, n4_cores: int) -> None:
    if not os.path.exists(os.path.join(_path(rows), "_SUCCESS")):
        subprocess.run(
            [sys.executable, __file__, "--gen", str(rows)], check=True, cwd=REPO
        )
    results = {}
    for cores in (n_cores, n4_cores):
        cmd = [sys.executable, __file__, "--inc-worker", str(cores), str(rows)]
        if os.path.exists("/usr/bin/taskset"):
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        p = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(p.stdout, p.stderr, file=sys.stderr)
            raise SystemExit(f"inc worker cores={cores} failed")
        results[cores] = json.loads(line[-1])
        print(f"# local[{cores}]: index {results[cores]['index_build_sec']}s, "
              f"shard {results[cores]['shard_dedup_sec']}s", file=sys.stderr)
    rn, rn4 = results[n_cores], results[n4_cores]
    eff = (
        rn4["shard_docs_per_sec"] / rn["shard_docs_per_sec"]
    ) / (n4_cores / n_cores)
    identical = all(
        rn[k] == rn4[k] for k in ("dropped", "n_kept", "kept_hash")
    )
    print(json.dumps({
        "metric": f"incremental_dedup_scaling_local{n_cores}_vs_local{n4_cores}",
        "value": round(eff, 3),
        "unit": "ratio",
        "rows": rows,
        "n": rn, "n4": rn4,
        "outputs_identical": identical,
    }))


def main(rows: int, n_cores: int, n4_cores: int, jvm: bool = False) -> None:
    # the corpus is deterministic in (SEED, rows), so an existing
    # committed write (parquet _SUCCESS marker) can be reused verbatim
    if not os.path.exists(os.path.join(_path(rows), "_SUCCESS")):
        subprocess.run(
            [sys.executable, __file__, "--gen", str(rows)],
            check=True, cwd=REPO,
        )
    worker_flag = "--jvm-worker" if jvm else "--worker"
    results = {}
    for cores in (n_cores, n4_cores):
        cmd = [sys.executable, __file__, worker_flag, str(cores), str(rows)]
        if os.path.exists("/usr/bin/taskset"):
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        p = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(p.stdout, p.stderr, file=sys.stderr)
            raise SystemExit(f"worker cores={cores} failed")
        results[cores] = json.loads(line[-1])
        print(f"# local[{cores}]: {results[cores]['elapsed_sec']}s "
              f"{results[cores]['docs_per_sec']} docs/s", file=sys.stderr)
    rn, rn4 = results[n_cores], results[n4_cores]
    eff = (rn4["docs_per_sec"] / rn["docs_per_sec"]) / (n4_cores / n_cores)
    identical = all(
        rn[k] == rn4[k]
        for k in ("n_exact_dup_groups", "n_verified_pairs", "n_kept", "kept_hash")
    )
    mode = "jvm" if jvm else "local"
    print(json.dumps({
        "metric": f"dedup_scaling_{mode}{n_cores}_vs_{mode}{n4_cores}",
        "value": round(eff, 3),
        "unit": "ratio",
        "rows": rows,
        "executors_jvm_isolated": jvm,
        "n": rn, "n4": rn4,
        "outputs_identical": identical,
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--gen":
        run_gen(int(sys.argv[2]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--worker":
        run_worker(int(sys.argv[2]), int(sys.argv[3]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--jvm-worker":
        run_worker(int(sys.argv[2]), int(sys.argv[3]),
                   jvm_workers=int(sys.argv[2]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--jvm":
        # N vs 4N single-core executor JVMs (local-cluster) — the
        # per-executor-allocation-domain test of the dedup family's
        # same-JVM thread-scaling shortfall (VERDICT r3 #4)
        rows = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
        n, n4 = (
            (int(sys.argv[3]), int(sys.argv[4]))
            if len(sys.argv) > 4
            else (2, 8)
        )
        main(rows, n, n4, jvm=True)
    elif len(sys.argv) > 1 and sys.argv[1] == "--inc-worker":
        run_inc_worker(int(sys.argv[2]), int(sys.argv[3]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--inc":
        rows = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
        n, n4 = (
            (int(sys.argv[3]), int(sys.argv[4]))
            if len(sys.argv) > 4
            else (2, 8)
        )
        main_inc(rows, n, n4)
    else:
        rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
        n, n4 = (
            (int(sys.argv[2]), int(sys.argv[3]))
            if len(sys.argv) > 3
            else (4, 16)
        )
        main(rows, n, n4)
