"""ValidationSuite — the engine's query-lifecycle orchestrator.

Reference lifecycle (SURVEY.md §3): construct plan -> fit (aggregations)
-> transform (marking) -> verdict emission. Spark lifecycle here:

    suite = ValidationSuite()
    result = suite.run(df, dim=source_dim, baseline_hist=...)
    result.verdicts / result.violations / result.drift

Job graph — the token payload (the table's dominant bytes) is scanned
exactly ONCE per run:
  1. fit: ONE n_tok value-count histogram scan (column-pruned, never
     touches `tokens`); count/min/max/mean/std and the exact
     quantiles/MAD all derive from it driver-side
  2. the violations job (runs once, materialized eagerly): marking (JVM
     array reductions + Arrow predicate UDF — the single pass that reads
     `tokens`), with the referential check INLINED as a literal isin
     flag (dimension collected once — no separate fact scan/anti-join)
     -> filter flagged -> explode; unioned with the hash-keyed salted
     uniqueness branch (column-pruned scan, 8-byte shuffle keys) and a
     fused per-partition row-count branch — so verdict assembly needs no
     extra pass over the input at all
  3. verdict assembly from the materialized violation set (tiny)
  4. drift: histogram agg + grouped-map PSI/chi²
Resume: partitions already in the checkpoint table are pruned from the
scan (partition-pruning filter), uniqueness stays global so cross-
partition duplicates are still caught.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from autoprepad_spark import schema as S
from autoprepad_spark.datagen import VOCAB_SIZE
from autoprepad_spark.operators import drift as drift_mod
from autoprepad_spark.operators.marking import (
    CustomCheck,
    ROW_CHECKS,
    mark,
    mark_slim,
    validate_custom_checks,
)
from autoprepad_spark.operators.profile import ProfileStats, global_stats
from autoprepad_spark.operators.uniqueness import duplicate_rows
from autoprepad_spark.plans import verdicts as V
from autoprepad_spark.plans.checkpoint import CheckpointTable

ALL_CHECKS = ROW_CHECKS + ["unique_doc_id", "ref_source"]
#: tag for the fused per-partition row-count rows in the violation union.
#: A configured violation_sink therefore contains these bookkeeping rows
#: (check_name == ROW_COUNT_MARK, detail == the partition's row count) —
#: per-partition lineage records that ride the same distributed write;
#: ValidationResult.violations filters them out, and consumers reading
#: the sink directly should filter on check_name != ROW_COUNT_MARK.
ROW_COUNT_MARK = "__row_count__"


def read_violations(spark, path: str) -> DataFrame:
    """Read a violation sink written by ValidationSuite.run(violation_sink=...).

    The sink contains fused per-partition row-count bookkeeping rows
    (check_name == ROW_COUNT_MARK, doc_id null, detail = the count) that
    ride the distributed violations write as a tagged union branch so
    lineage costs no extra pass. This is THE supported way to consume
    the sink as pure violations; ``read_row_counts`` returns the lineage
    side."""
    return spark.read.parquet(path).filter(F.col("check_name") != ROW_COUNT_MARK)


def read_row_counts(spark, path: str) -> DataFrame:
    """(part, row_count) lineage rows from a violation sink."""
    return (
        spark.read.parquet(path)
        .filter(F.col("check_name") == ROW_COUNT_MARK)
        .select("part", F.col("detail").cast("long").alias("row_count"))
    )


@dataclass
class ValidationResult:
    stats: ProfileStats
    verdicts: DataFrame
    violations: DataFrame
    marked: DataFrame
    drift: DataFrame | None = None
    schema_issues: list = field(default_factory=list)
    #: run metrics captured via Observation on the violations write —
    #: free of charge (no extra pass): n_violation_rows, n_partitions
    metrics: dict = field(default_factory=dict)
    _cached: list = field(default_factory=list)

    def top_violations(self, n: int = 100) -> DataFrame:
        return V.top_violations(self.violations, self.marked, n)

    def unpersist(self) -> None:
        """Release the run's internal caches (core + violations)."""
        for c in self._cached:
            c.unpersist()


@dataclass
class ValidationSuite:
    vocab_size: int = VOCAB_SIZE
    engine: str = "arrow"  # arrow | native predicate evaluation
    exact_quantiles: bool = True  # False -> percentile_approx sketch (scale path)
    stat_max_rate: float = V.STAT_MAX_RATE
    bucket_width: int = drift_mod.DEFAULT_BUCKET_WIDTH
    validate_input_schema: bool = True
    #: restrict to a subset of ALL_CHECKS (the reference's exclusion
    #: knobs, pipelines/runs.py:287-308); None = run everything. Skipped
    #: branches are skipped in the PLAN (no uniqueness shuffle when
    #: unique_doc_id is excluded, no dim collect when ref_source is).
    checks: list[str] | None = None
    #: user-defined constraints (marking.CustomCheck): declarative
    #: Column/SQL predicates fused into the SAME marking scan as the
    #: built-ins — violations, per-partition verdicts (hard or
    #: statistical rule), checkpoint/resume and sinks all treat them
    #: exactly like built-in checks. The `checks` subset knob applies
    #: to their names too.
    custom_checks: list = field(default_factory=list)

    def run(
        self,
        df: DataFrame,
        *,
        dim: DataFrame | None = None,
        baseline_hist: DataFrame | None = None,
        checkpoint: CheckpointTable | None = None,
        run_id: str | None = None,
        stats: ProfileStats | None = None,
        violation_sink: str | None = None,
    ) -> ValidationResult:
        issues = []
        if self.validate_input_schema:
            report = S.validate_schema(df, S.TOKENS_SCHEMA, allow_extra=True)
            issues = report.issues
            if any(i.kind in ("missing", "type_mismatch") for i in issues):
                raise ValueError(f"input schema does not conform: {issues}")

        # fit statistics ALWAYS over the full table (resume-deterministic)
        if stats is None:
            stats = global_stats(df, exact_quantiles=self.exact_quantiles)

        todo = checkpoint.remaining(df, run_id) if checkpoint and run_id else df

        custom = validate_custom_checks(self.custom_checks)
        custom_names = [c.name for c in custom]
        all_checks = ALL_CHECKS + custom_names
        selected = set(self.checks) if self.checks is not None else set(all_checks)
        unknown = selected - set(all_checks)
        if unknown:
            raise ValueError(f"unknown checks: {sorted(unknown)}")
        custom = [c for c in custom if c.name in selected]

        # Referential check: the dimension side must fit executor memory
        # to be broadcastable at all, so collect it once and inline the
        # check into the marking pass as a literal isin flag — no second
        # fact-table scan, no anti-join.
        allowed = None
        if dim is not None and "ref_source" in selected:
            d = dim
            if "active" in dim.columns:
                d = d.filter(F.col("active"))
            allowed = sorted(
                r["source"] for r in d.select("source").distinct().collect()
            )

        # The plan's marking pass carries no token passthrough (the
        # validator never emits tokens), so the arrow engine uses the
        # queue-free mapInPandas variant — see mark_slim's docstring.
        if self.engine == "arrow":
            marked = mark_slim(
                todo, stats, vocab_size=self.vocab_size, allowed_sources=allowed,
                custom=custom,
            )
        else:
            marked = mark(
                todo, stats, vocab_size=self.vocab_size, engine=self.engine,
                allowed_sources=allowed, custom=custom,
            )
        # ONE pass reads the token payload: marking (JVM array reductions
        # + Arrow predicate UDF) -> filter flagged rows -> explode, inside
        # the violations job below, which runs exactly once (violations
        # are materialized eagerly). Every other pass below is
        # column-pruned and never touches `tokens`.
        row_viol = V.explode_violations(marked, include=selected)

        # uniqueness over the FULL table (cross-partition duplicates must
        # be caught even on resume): needs only key + light columns — a
        # column-pruned scan shuffling 8-byte key hashes, independent of
        # the marking pass
        dup_viol = None
        if "unique_doc_id" in selected:
            dup_src = df.select("part", "doc_id", "n_tok", "source")
            dup_viol = (
                duplicate_rows(dup_src, "doc_id")
                .select(
                    "part",
                    F.lit("unique_doc_id").alias("check_name"),
                    "doc_id",
                    F.lit(None).cast("string").alias("detail"),
                )
            )
            if checkpoint and run_id:
                done = checkpoint.completed_parts(run_id)
                if done:
                    dup_viol = dup_viol.filter(~F.col("part").isin(done))

        # per-partition row counts ride the same job as a fused branch
        # (tagged rows in the union) instead of costing their own scan
        rc_rows = todo.groupBy("part").agg(
            F.count(F.lit(1)).alias("_rc")
        ).select(
            "part",
            F.lit(ROW_COUNT_MARK).alias("check_name"),
            F.lit(None).cast("string").alias("doc_id"),
            F.col("_rc").cast("string").alias("detail"),
        )

        violations = row_viol.unionByName(rc_rows)
        if dup_viol is not None:
            violations = violations.unionByName(dup_viol)
        # free run metrics: Observation aggregates ride the same action
        # that materializes the union — no extra pass over anything
        from pyspark.sql import Observation

        obs = Observation()
        violations = violations.observe(
            obs,
            F.coalesce(
                F.sum((F.col("check_name") != ROW_COUNT_MARK).cast("long")),
                F.lit(0),
            ).alias("n_violation_rows"),
            F.coalesce(
                F.sum((F.col("check_name") == ROW_COUNT_MARK).cast("long")),
                F.lit(0),
            ).alias("n_partitions"),
        )
        # Materialize the violation set ONCE, eagerly — consuming it
        # lazily through downstream joins does not reliably populate a
        # cache (observed: the verdict DAG's broadcast side bypassed it),
        # which silently re-ran the marking pass + uniqueness shuffle per
        # consumer. With a sink configured (the production shape: an
        # Iceberg/parquet violations table), materialization is a fully
        # distributed write and verdict counts aggregate from the sink;
        # without one, fall back to an in-memory cache + eager count.
        cached = []
        if violation_sink is not None:
            violations.write.mode("overwrite").parquet(violation_sink)
            violations = df.sparkSession.read.parquet(violation_sink)
        else:
            violations = violations.cache()
            violations.count()
            cached.append(violations)

        row_counts = violations.filter(
            F.col("check_name") == ROW_COUNT_MARK
        ).select("part", F.col("detail").cast("long").alias("row_count"))
        violations = violations.filter(F.col("check_name") != ROW_COUNT_MARK)
        check_names = [
            c
            for c in all_checks
            if c in selected and (c != "ref_source" or dim is not None)
        ]
        hard = V.HARD_CHECKS | {c.name for c in custom if c.hard}
        stat_rates = {
            c.name: c.stat_max_rate
            for c in custom
            if not c.hard and c.stat_max_rate is not None
        }
        verdicts = V.assemble_verdicts(
            row_counts, violations, check_names,
            stat_max_rate=self.stat_max_rate, hard_checks=hard,
            stat_rates=stat_rates,
        )

        drift_df = None
        if baseline_hist is not None:
            current = drift_mod.ntok_histogram(df, bucket_width=self.bucket_width)
            drift_df = drift_mod.drift(baseline_hist, current)

        return ValidationResult(
            stats=stats,
            verdicts=verdicts,
            violations=violations,
            marked=marked,
            drift=drift_df,
            schema_issues=issues,
            metrics=dict(obs.get),
            _cached=cached,
        )
