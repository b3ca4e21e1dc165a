"""Verdict + violation assembly.

The reference emits per-row AnomalyScore/AnomalyLabel plus MAD_Total /
Tukey_Total counts, violation rows sorted to the top
(/root/reference/pipelines/runs.py:198-222, experiment.py:424-454). The
engine's equivalent output is:

* ``violations`` — one row per (row, violated check): the materialized
  violation set, severity-orderable,
* ``verdicts``  — one row per (partition, check): pass/fail + metric +
  violation_count + row_count.

Scale design: the expensive marking pass runs ONCE — violations are
materialized first (a filter on flag_total>0 keeps the output tiny), and
per-partition verdict counts are then aggregated from the violation set
(tiny) joined against a cheap column-pruned row-count pass, instead of
re-running the marking UDF for the aggregation. The (part x check) grid
is densified driver-side (both sides are small by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from autoprepad_spark.operators.marking import FLAG_COLS, REF_CHECK, REF_FLAG, ROW_CHECKS

#: checks whose violations are hard failures (any violation -> fail)
HARD_CHECKS = {
    "null_doc_id",
    "len_mismatch",
    "token_oob",
    "empty_tokens",
    "unique_doc_id",
    "ref_source",
}
#: statistical checks pass while the violation RATE stays under threshold
#: (default 0.1 — the reference's top-10% labeling default, control.py:98)
STAT_MAX_RATE = 0.1


def explode_violations(marked: DataFrame, include: set[str] | None = None) -> DataFrame:
    """Marked rows -> one violation row per (row, violated check).

    Filter-before-explode: only rows with flag_total > 0 reach the
    generator, so the explode multiplies a <<1% subset. Picks up the
    inlined referential flag automatically when the marking pass added
    it (detail = the offending source value; row checks carry n_tok).
    When the marking pass retained the array diagnostics (mark_slim),
    structural checks carry them in detail — n_tok:actual_len for
    length checks, min:max token ids for the bounds check. (These
    references also pin the reductions as multi-use projected columns,
    which is what keeps the token payload out of the python-exchange
    queue — see mark_slim.)
    """
    ntd = F.col("n_tok").cast("string")
    details = {}
    if "_len" in marked.columns:
        len_detail = F.concat_ws(":", ntd, F.col("_len").cast("string"))
        details["len_mismatch"] = len_detail
        details["empty_tokens"] = len_detail
        details["token_oob"] = F.concat_ws(
            ":",
            F.col("_tmin").cast("long").cast("string"),
            F.col("_tmax").cast("long").cast("string"),
        )
    checks = [
        (name, flag, details.get(name, ntd))
        for name, flag in zip(ROW_CHECKS, FLAG_COLS)
    ]
    if REF_FLAG in marked.columns:
        checks.append((REF_CHECK, REF_FLAG, F.col("source")))
    # custom checks ride the marking pass as f_<name> (+ optional
    # _d_<name> detail) columns — auto-discovered here by convention,
    # so the explode needs no side-channel check registry
    known = set(FLAG_COLS) | {REF_FLAG}
    for col in marked.columns:
        if col.startswith("f_") and col not in known:
            name = col[2:]
            detail = (
                F.col(f"_d_{name}")
                if f"_d_{name}" in marked.columns
                else ntd
            )
            checks.append((name, col, detail))
    if include is not None:
        checks = [c for c in checks if c[0] in include]
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                F.col(flag).alias("v"),
                detail.alias("detail"),
            )
            for name, flag, detail in checks
        ]
    )
    hit = F.filter(pairs, lambda s: s["v"] == 1)
    return (
        marked.filter(F.col("flag_total") > 0)
        .select("part", F.explode(hit).alias("_h"), "doc_id")
        .select(
            "part",
            F.col("_h.check_name").alias("check_name"),
            "doc_id",
            F.col("_h.detail").alias("detail"),
        )
    )


def assemble_verdicts(
    row_counts: DataFrame,
    violations: DataFrame,
    check_names: list[str],
    *,
    stat_max_rate: float = STAT_MAX_RATE,
    hard_checks: set[str] | None = None,
    stat_rates: dict[str, float] | None = None,
) -> DataFrame:
    """Densify (part x check) and compute pass/fail.

    row_counts: (part, row_count); violations: VIOLATION_SCHEMA rows.
    hard_checks: names judged by the any-violation-fails rule (default
    HARD_CHECKS); everything else uses the statistical rate rule. The
    suite extends the default set with hard CustomChecks.
    stat_rates: per-check overrides of the statistical ceiling (from
    CustomCheck.stat_max_rate) — a when-chain over a handful of names,
    so the verdict expression stays pure codegen.
    """
    spark = row_counts.sparkSession
    checks = spark.createDataFrame([(c,) for c in check_names], ["check_name"])
    grid = row_counts.crossJoin(F.broadcast(checks))
    counts = violations.groupBy("part", "check_name").agg(
        F.count(F.lit(1)).alias("violation_count")
    )
    merged = grid.join(counts, ["part", "check_name"], "left").fillna(
        {"violation_count": 0}
    )
    rate = F.col("violation_count") / F.greatest(F.col("row_count"), F.lit(1))
    is_hard = F.col("check_name").isin(*sorted(hard_checks or HARD_CHECKS))
    ceiling = F.lit(stat_max_rate)
    for name, r in sorted((stat_rates or {}).items()):
        ceiling = F.when(F.col("check_name") == name, F.lit(float(r))).otherwise(
            ceiling
        )
    status = F.when(
        is_hard, F.when(F.col("violation_count") > 0, "fail").otherwise("pass")
    ).otherwise(F.when(rate > ceiling, "fail").otherwise("pass"))
    return merged.select(
        "part",
        "check_name",
        status.alias("status"),
        rate.cast("double").alias("metric"),
        F.col("violation_count").cast("long"),
        F.col("row_count").cast("long"),
    )


def top_violations(violations: DataFrame, marked: DataFrame, n: int = 100) -> DataFrame:
    """Severity-ordered head — the analog of the reference's sort-desc-by-
    (AnomalyScore, MAD_Total, Tukey_Total) output (runs.py:435).
    TakeOrderedAndProject: no full sort materialization."""
    sev = marked.filter(F.col("flag_total") > 0).select(
        "part", "doc_id", "flag_total"
    )
    return (
        violations.join(sev, ["part", "doc_id"], "left")
        .orderBy(F.desc_nulls_last("flag_total"), "part", "doc_id")
        .limit(n)
    )
