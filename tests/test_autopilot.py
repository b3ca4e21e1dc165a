"""End-to-end autopilot composition (VERDICT r4 next-round #6): the
profile -> suggest -> persist -> compile -> validate -> checkpoint ->
resume -> metric-history loop driven as ONE flow across three simulated
runs with an injected regression.

Each piece is oracle- or pytest-pinned on its own (suggest.py,
suite/verdicts, checkpoint.py, drift.history_flags — and the analytical
core of this loop is the fully-DuckDB-oracled `autopilot_loop` driver
entry); this file proves the SEAMS: suggestions survive a parquet
round-trip into the runner's --checks-from compiler, an interrupted run
resumes from the lineage table without rescanning completed partitions,
re-marking is idempotent, and the verdict history accumulated across
runs flags exactly the engineered regression partition.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from autoprepad_spark import ValidationSuite
from autoprepad_spark.operators.drift import history_flags
from autoprepad_spark.operators.suggest import (
    suggest_checks,
    to_custom_checks,
)
from autoprepad_spark.plans.checkpoint import CheckpointTable


def _run_frame(tokens_df, salt: str, hot: bool):
    """Deterministic per-run aux-null injection (md5 cadence ~2/16);
    `hot` additionally nulls ~6/16 of partition p-000 — the engineered
    regression."""
    h1 = F.substring(F.md5(F.concat(F.col("doc_id"), F.lit(":" + salt))), 1, 1)
    cond = h1.isin("0", "1")
    if hot:
        h2 = F.substring(F.md5(F.concat(F.col("doc_id"), F.lit(":hot"))), 1, 1)
        cond = cond | ((F.col("part") == "p-000")
                       & h2.isin("0", "1", "2", "3", "4", "5"))
    return tokens_df.withColumn(
        "aux", F.when(cond, F.lit(None).cast("string")).otherwise(F.lit("v")))


def test_autopilot_full_loop(spark, tokens_df, tmp_path):
    runs = [_run_frame(tokens_df, "r1", False),
            _run_frame(tokens_df, "r2", False),
            _run_frame(tokens_df, "r3", True)]
    all_parts = sorted(
        r["part"] for r in tokens_df.select("part").distinct().collect())

    # 1. profile-once on run 1, PERSIST the suggestions (the artifact a
    # nightly job would write), read them back the way the runner's
    # --checks-from does, and compile
    sugg_path = str(tmp_path / "suggestions.parquet")
    suggest_checks(runs[0], cols=["aux", "source"], partition_col="part"
                   ).write.mode("overwrite").parquet(sugg_path)
    checks = [c for c in to_custom_checks(spark.read.parquet(sugg_path))
              if c.name in {"sugg_null_rate_max_aux", "sugg_isin_aux",
                            "sugg_not_null_source", "sugg_isin_source"}]
    assert len(checks) == 4
    rate_check = [c for c in checks if c.name == "sugg_null_rate_max_aux"][0]
    assert rate_check.stat_max_rate is not None  # ceiling survived parquet

    # 2. three runs; each appends lineage + verdict history
    ck = CheckpointTable(spark, str(tmp_path / "lineage"))
    hist = None
    for seq, frame in enumerate(runs, start=1):
        run_id = f"run-{seq}"

        if seq == 3:
            # interrupted run: first half of the partitions were
            # completed before the crash
            done = all_parts[: len(all_parts) // 2]
            ck.mark(run_id, [(p, 0, 0, 0.0) for p in done])
            remaining = ck.remaining(frame, run_id)
            got_parts = sorted(
                r["part"] for r in
                remaining.select("part").distinct().collect())
            assert got_parts == all_parts[len(all_parts) // 2:]
            # resume validates ONLY the remainder; for history we still
            # need full-run verdicts, so validate the remainder and the
            # (previously completed) head separately and union — which
            # is exactly what the per-partition verdict rows allow
            res_tail = ValidationSuite(
                custom_checks=checks, checks=[c.name for c in checks]
            ).run(remaining)
            res_head = ValidationSuite(
                custom_checks=checks, checks=[c.name for c in checks]
            ).run(frame.filter(F.col("part").isin(done)))
            v = res_tail.verdicts.unionByName(res_head.verdicts)
            v = v.select("part", "check_name", "status",
                         F.col("metric").cast("double").alias("metric")
                         ).withColumn("run_seq", F.lit(seq)).cache()
            v.count()
            res_tail.unpersist()
            res_head.unpersist()
        else:
            res = ValidationSuite(
                custom_checks=checks, checks=[c.name for c in checks]
            ).run(frame)
            v = res.verdicts.select(
                "part", "check_name", "status",
                F.col("metric").cast("double").alias("metric")
            ).withColumn("run_seq", F.lit(seq)).cache()
            v.count()
            res.unpersist()

        # lineage append from the verdict frame (part-level rollup)
        parts = [
            (r["part"], 0, 0, 0.0)
            for r in v.select("part").distinct().collect()
        ]
        ck.mark(f"run-{seq}", parts)
        hist = v if hist is None else hist.unionByName(v)

    # 3. idempotence: re-marking completed partitions changes nothing
    before = ck.completed_parts("run-3")
    ck.mark("run-3", [(all_parts[0], 0, 0, 0.0)])
    assert ck.completed_parts("run-3") == before == all_parts

    # 4. metric history over the three runs flags the regression
    hf = history_flags(hist, "metric", key_cols=("part", "check_name"),
                       order_col="run_seq", min_history=2)
    run3 = {(r["part"], r["check_name"]): r
            for r in hf.filter(F.col("run_seq") == 3).collect()}
    reg = run3[("p-000", "sugg_null_rate_max_aux")]
    assert reg["flagged"] and reg["status"] == "fail"
    assert reg["mod_z"] > 3.5 and reg["metric"] > 0.4
    # hard checks stayed clean and unflagged everywhere
    for (part, name), r in run3.items():
        if name != "sugg_null_rate_max_aux":
            assert r["status"] == "pass" and r["metric"] == 0.0
            assert not r["flagged"], (part, name)
    # runs 1-2 pass everywhere: the ceiling was suggested per-partition
    # from run 1 itself (the r5 hold-property fix)
    early = hist.filter(
        (F.col("run_seq") < 3) & (F.col("status") == "fail")).count()
    assert early == 0


def test_autopilot_runner_cli_checks_from(spark, tokens_df, dim_df, tmp_path):
    """The same loop through the CLI surface: persisted suggestions ->
    runner --checks-from --checkpoint across two invocations with the
    same run-id; the second resumes (skips completed partitions)."""
    from autoprepad_spark import runner

    inp = str(tmp_path / "input.parquet")
    _run_frame(tokens_df, "r1", False).write.mode("overwrite").parquet(inp)
    sugg_path = str(tmp_path / "sugg.parquet")
    suggest_checks(spark.read.parquet(inp), cols=["aux"],
                   partition_col="part"
                   ).write.mode("overwrite").parquet(sugg_path)
    out1 = str(tmp_path / "out1")
    ckpt = str(tmp_path / "ck")
    rc = runner.main([
        "--input", inp, "--output", out1, "--run-id", "r9",
        "--checkpoint", ckpt, "--checks-from", sugg_path,
    ])
    # generate_tokens injects built-in violations by design, so the full
    # suite exits 2 (failures found); the loop under test is the
    # suggestion round-trip + lineage, asserted below
    assert rc in (0, 2)
    verdicts = spark.read.parquet(f"{out1}/verdicts")
    sugg_names = {r["check_name"] for r in verdicts.select("check_name")
                  .distinct().collect() if r["check_name"].startswith("sugg_")}
    assert "sugg_null_rate_max_aux" in sugg_names  # compiled from parquet
    assert verdicts.filter(
        F.col("check_name").startswith("sugg_")
        & (F.col("status") == "fail")).count() == 0  # hold property via CLI
    done = CheckpointTable(spark, ckpt).completed_parts("r9")
    assert done  # lineage written
    # re-invoke with the same run id: everything is completed, the
    # resume path validates zero remaining partitions cleanly
    out2 = str(tmp_path / "out2")
    rc2 = runner.main([
        "--input", inp, "--output", out2, "--run-id", "r9",
        "--checkpoint", ckpt, "--checks-from", sugg_path,
    ])
    assert rc2 in (0, 2)
    assert CheckpointTable(spark, ckpt).completed_parts("r9") == done
    # the resumed run validated zero remaining partitions: its verdict
    # table is empty (all parts were already in the lineage)
    assert spark.read.parquet(f"{out2}/verdicts").count() == 0
