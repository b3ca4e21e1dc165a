"""Stage-level scaling probe: runs ONE ValidationSuite pass with the
Spark event log enabled, then prints per-stage wall time, summed task
time, and shuffle bytes — so a 4-core vs 16-core comparison attributes
the scaling loss to a specific stage.

Usage: taskset -c 0-{N-1} python tools/stage_probe.py CORES ROWS
"""
from __future__ import annotations

import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(cores: int, rows: int) -> None:
    import shutil

    evdir = f"/tmp/spark-events-{cores}"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)

    from autoprepad_spark.session import get_spark
    from autoprepad_spark.datagen import source_dim
    from autoprepad_spark.plans.suite import ValidationSuite

    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_spark(
        f"stage-probe-{cores}", cores=cores,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
        },
    )
    tmp = os.environ.get("SPARK_BENCH_TMP", "/tmp")
    df = spark.read.parquet(os.path.join(tmp, f"bench_tok_{rows}"))
    dim = source_dim(spark)
    warm = spark.read.parquet(os.path.join(tmp, "bench_tok_warm"))
    ValidationSuite().run(warm, dim=dim).verdicts.count()

    sink = os.path.join(tmp, f"probe_sink_{cores}")
    engine = os.environ.get("SUITE_ENGINE", "arrow")
    t0 = time.perf_counter()
    res = ValidationSuite(engine=engine).run(df, dim=dim, violation_sink=sink)
    res.verdicts.count()
    res.violations.count()
    elapsed = time.perf_counter() - t0
    spark.stop()

    stages = {}
    import subprocess

    paths = [
        p
        for p in glob.glob(f"{evdir}/**/*", recursive=True)
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
    ]
    for path in paths:
        if path.endswith(".zstd"):
            text = subprocess.run(
                ["zstd", "-d", "-c", path], capture_output=True, text=True
            ).stdout.splitlines()
        else:
            with open(path) as f:
                text = f.read().splitlines()
        for line in text:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sid = si["Stage ID"]
                    sub = si.get("Submission Time")
                    comp = si.get("Completion Time")
                    stages[sid] = {
                        "name": si["Stage Name"].split("\n")[0][:60],
                        "tasks": si["Number of Tasks"],
                        "wall_s": round((comp - sub) / 1000.0, 2) if sub and comp else None,
                    }
                elif ev.get("Event") == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    m = ev.get("Task Metrics") or {}
                    s = stages.setdefault(sid, {})
                    s["task_s"] = s.get("task_s", 0.0) + m.get("Executor Run Time", 0) / 1000.0
                    s["cpu_s"] = s.get("cpu_s", 0.0) + m.get("Executor CPU Time", 0) / 1e9
                    srm = m.get("Shuffle Read Metrics") or {}
                    swm = m.get("Shuffle Write Metrics") or {}
                    s["sh_read_mb"] = s.get("sh_read_mb", 0.0) + (
                        srm.get("Remote Bytes Read", 0) + srm.get("Local Bytes Read", 0)
                    ) / 1e6
                    s["sh_write_mb"] = s.get("sh_write_mb", 0.0) + swm.get(
                        "Shuffle Bytes Written", 0
                    ) / 1e6
                    jvm_gc = m.get("JVM GC Time", 0)
                    s["gc_s"] = s.get("gc_s", 0.0) + jvm_gc / 1000.0

    # keep only the measured run's stages (warmup stages have lower IDs;
    # crude cut: drop stages whose wall time is tiny AND id below midpoint)
    print(json.dumps({"cores": cores, "elapsed": round(elapsed, 2)}))
    for sid in sorted(stages, key=lambda s: -(stages[s].get("wall_s") or 0))[:14]:
        s = stages[sid]
        print(
            f"stage {sid:3d} wall={s.get('wall_s')}s tasks={s.get('tasks')} "
            f"task_sum={round(s.get('task_s', 0), 1)}s cpu_sum={round(s.get('cpu_s', 0), 1)}s "
            f"gc={round(s.get('gc_s', 0), 1)}s shR={round(s.get('sh_read_mb', 0))}MB "
            f"shW={round(s.get('sh_write_mb', 0))}MB  {s.get('name')}"
        )


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]))
