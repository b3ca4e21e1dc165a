"""Constraint suggestion + profile snapshots/diff — the engine's
profile-to-constraints loop.

No reference counterpart (the reference's anomaly pipeline *fits*
thresholds transformer-by-transformer — TukeyTransformer.py:36-42 etc. —
but never emits reusable declarative constraints); this is the
Deequ-style ``ConstraintSuggestion`` capability a validation engine
needs at corpus scale: profile a snapshot once, compile what the data
already satisfies into `CustomCheck` predicates, and run those checks
forever after inside `ValidationSuite`'s single marking scan.

Plan shape (the part that must survive 10^12 rows):

* **pass 1** — `column_profile`: ONE wide codegen hash-agg over all
  requested columns (count / nulls / min / max / approx-distinct per
  column in the same partial+final agg; the result is a single row, so
  the driver collect is O(|cols|), never O(rows)). Distinct counts use
  Spark's built-in HLL++ (`approx_count_distinct`, rsd 2%) because here
  the estimate only *gates* later decisions — the checks it wires up
  (uniqueness, isin) are themselves exact at validation time.
* **pass 2** — exact domains, ONLY for columns whose distinct estimate
  clears the `domain_max` guard: a column-pruned scan melts just those
  columns, groupBy(col, value) bounds the shuffle at
  O(Σ small-column domains), and a row_number window caps what reaches
  the driver at `domain_max + 1` values per column — a column whose
  estimate lied past the cap loses its isin suggestion instead of
  blowing up the driver.

`profile_snapshot` persists pass 1 as a tiny (|cols|-row) frame;
`snapshot_diff` full-outer-joins two snapshots to report schema
evolution (added / removed / type-changed) and distribution movement
(null-rate delta, numeric bounds escape, distinct-density swing,
row-count swing) — the "did yesterday's corpus drift under me"
question answered from two kilobyte-scale artifacts, no rescan.
"""

from __future__ import annotations

import json
import math
import re

from dataclasses import dataclass

import pandas as pd

from pyspark.sql import Column, DataFrame, Window, functions as F, types as T

from autoprepad_spark.operators.marking import CustomCheck

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _qname(c: str) -> str:
    """Backtick-quoted identifier for predicates and F.col — required
    for column names containing dots (struct-access otherwise), dashes,
    spaces, or backticks (doubled per Spark quoting rules)."""
    return "`" + c.replace("`", "``") + "`"


def _qcol(c: str) -> Column:
    return F.col(_qname(c))


#: schema of profile_snapshot / column_profile output
SNAPSHOT_SCHEMA = T.StructType([
    T.StructField("column", T.StringType(), False),
    T.StructField("dtype", T.StringType(), False),
    T.StructField("n_rows", T.LongType(), False),
    T.StructField("n_null", T.LongType(), False),
    T.StructField("distinct_est", T.LongType(), False),
    T.StructField("min_value", T.StringType(), True),
    T.StructField("max_value", T.StringType(), True),
    T.StructField("min_num", T.DoubleType(), True),
    T.StructField("max_num", T.DoubleType(), True),
])


def _profilable(df: DataFrame, cols: list[str] | None) -> list[tuple[str, T.DataType]]:
    fields = {f.name: f.dataType for f in df.schema.fields}
    if cols is None:
        # atomic columns only — arrays/structs/maps/binary have no
        # meaningful min/max/domain semantics for constraint suggestion
        return [
            (n, t)
            for n, t in fields.items()
            if isinstance(t, (T.StringType, T.BooleanType, T.DateType,
                              T.TimestampType, *_NUMERIC))
        ]
    missing = [c for c in cols if c not in fields]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    return [(c, fields[c]) for c in cols]


def column_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column stats from ONE wide agg scan.

    Returns a |cols|-row frame with SNAPSHOT_SCHEMA. min/max are carried
    twice: as display strings (every type) and as doubles (numeric
    columns only) so snapshot_diff can do real interval arithmetic.
    approx_count_distinct is deterministic for a fixed input regardless
    of partitioning (HLL++ register-union is order-independent), so
    snapshots taken at different parallelism are byte-identical.
    """
    spark = df.sparkSession
    pcols = _profilable(df, cols)
    if not pcols:
        return spark.createDataFrame([], SNAPSHOT_SCHEMA)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c, t in pcols:
        col = _qcol(c)
        aggs.append(F.count(col).alias(f"nn_{c}"))
        aggs.append(F.approx_count_distinct(col, 0.02).alias(f"d_{c}"))
        aggs.append(F.min(col).cast("string").alias(f"mins_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"maxs_{c}"))
        if isinstance(t, _NUMERIC):
            aggs.append(F.min(col).cast("double").alias(f"minn_{c}"))
            aggs.append(F.max(col).cast("double").alias(f"maxn_{c}"))
    row = df.agg(*aggs).collect()[0].asDict()
    out = []
    for c, t in pcols:
        out.append((
            c, t.simpleString(), int(row["__n"]),
            int(row["__n"]) - int(row[f"nn_{c}"]),
            int(row[f"d_{c}"]),
            row[f"mins_{c}"], row[f"maxs_{c}"],
            row.get(f"minn_{c}"), row.get(f"maxn_{c}"),
        ))
    return spark.createDataFrame(out, SNAPSHOT_SCHEMA)


def profile_snapshot(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Alias of column_profile — the persistable snapshot artifact
    (write it next to the checkpoint table; kilobytes per snapshot)."""
    return column_profile(df, cols)


# ---------------------------------------------------------------------------
# suggestion
# ---------------------------------------------------------------------------

#: schema of suggest_checks output
SUGGESTION_SCHEMA = T.StructType([
    T.StructField("column", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("predicate_sql", T.StringType(), True),
    T.StructField("params", T.StringType(), False),
    T.StructField("evidence", T.StringType(), False),
    T.StructField("hard", T.BooleanType(), False),
])


def _sql_literal(v: str, dtype: str) -> str | None:
    """Spark SQL literal for a stringified domain value, or None when
    the value has no parseable literal form (NaN/Infinity in a float
    domain). Backslash must be escaped FIRST — Spark's default parser
    treats it as an escape character inside string literals, so an
    unescaped trailing backslash is a ParseException and an interior
    one silently changes the value."""
    if dtype in ("string", "date", "timestamp"):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if dtype == "boolean":
        return v
    try:
        if not math.isfinite(float(v)):
            return None
    except ValueError:
        return None
    return v


@dataclass(frozen=True)
class SuggestConfig:
    """Knobs for suggest_checks; defaults follow Deequ's spirit.

    domain_max       isin suggested only when the EXACT domain has at
                     most this many values.
    domain_slack     estimate guard for the pass-2 scan: a column enters
                     the exact-domain pass when its HLL estimate is
                     <= domain_max * domain_slack (covers the 2% rsd).
    null_headroom    suggested statistical null-rate ceiling =
                     observed_rate * null_headroom (capped at 1.0).
    unique_margin    `unique` suggested when distinct_est >=
                     (1 - unique_margin) * non-null count — wide enough
                     that the rsd can't suppress a truly-unique column,
                     tight enough that 2x duplication never passes.
    """

    domain_max: int = 32
    domain_slack: float = 2.0
    null_headroom: float = 1.5
    unique_margin: float = 0.05


def suggest_checks(
    df: DataFrame,
    cols: list[str] | None = None,
    *,
    config: SuggestConfig = SuggestConfig(),
    profile: DataFrame | None = None,
    partition_col: str | None = None,
) -> DataFrame:
    """Suggest declarative constraints the data currently satisfies.

    Returns SUGGESTION_SCHEMA rows, deterministic order (column, kind).
    Pass a pre-computed `profile` (column_profile output) to skip
    pass 1 — e.g. when suggesting from a persisted snapshot.

    Kinds emitted:
      not_null        column has zero nulls (hard)
      null_rate_max   column has nulls; ceiling = rate * headroom (soft)
      unique          distinct ~= non-null count (HLL-gated), then
                      CONFIRMED by one exact count_distinct agg over
                      the candidates — wire to the suite's exact salted
                      uniqueness check (no row predicate). The exact
                      confirm is the same shuffle family as the
                      uniqueness check it wires up, restricted to
                      candidate columns, so the 2% HLL rsd can never
                      suggest `unique` for a column with genuine
                      duplicates (which would false-fail immediately).
      isin            exact domain <= domain_max values (hard)
      non_negative    numeric with min >= 0 (hard)
      range           numeric observed [min, max] (soft — future data
                      may legitimately exceed a sample's bounds)

    The hold property (every suggested check passes on its own source
    data) is exact for the hard kinds. For `null_rate_max` the verdict
    rule is PER-PARTITION while the profile is global, so pass
    `partition_col` (the suite's verdict partition column) to derive
    the ceiling from the MAX per-partition null rate via one extra
    shrinking groupBy agg — then no partition of the source data can
    fail its own suggestion. Without it the ceiling is global-rate ×
    headroom and a partition whose null rate exceeds headroom × the
    global rate can legitimately fail (documented global-only mode).
    """
    spark = df.sparkSession
    pcols = dict(_profilable(df, cols))
    prof = profile if profile is not None else column_profile(df, cols)
    stats = {r["column"]: r for r in prof.collect() if r["column"] in pcols}

    # unique candidates are HLL-gated, then confirmed with ONE exact
    # count_distinct agg (partial-dedup shuffle bounded by the distinct
    # counts of near-unique columns — the cost the wired-up uniqueness
    # check pays anyway); nullable candidates stay gated per the exact
    # nn comparison below
    uniq_candidates = [
        c for c, r in stats.items()
        if (r["n_rows"] - r["n_null"]) > 0
        and r["distinct_est"] >= (1 - config.unique_margin) * (r["n_rows"] - r["n_null"])
    ]
    exact_distinct: dict[str, int] = {}
    if uniq_candidates:
        row = df.agg(*[
            F.count_distinct(_qcol(c)).alias(f"xd_{c}")
            for c in uniq_candidates
        ]).collect()[0].asDict()
        exact_distinct = {c: int(row[f"xd_{c}"]) for c in uniq_candidates}

    # per-partition max null rate for the null_rate_max ceiling: one
    # groupBy(partition) agg over the nullable columns, rolled up to a
    # single max row — O(|partitions|) intermediate, 1-row collect
    part_max_rate: dict[str, float] = {}
    if partition_col is not None:
        if partition_col not in df.columns:
            raise ValueError(f"partition column {partition_col!r} not in frame")
        nullable = [c for c, r in stats.items() if r["n_null"] > 0]
        if nullable:
            per_part = df.groupBy(_qcol(partition_col)).agg(
                F.count(F.lit(1)).alias("__n"),
                *[F.count(_qcol(c)).alias(f"nn_{c}") for c in nullable])
            mrow = per_part.agg(*[
                F.max((F.col("__n") - F.col(f"nn_{c}"))
                      / F.col("__n")).alias(f"mr_{c}")
                for c in nullable
            ]).collect()[0].asDict()
            part_max_rate = {c: float(mrow[f"mr_{c}"]) for c in nullable}

    out: list[tuple] = []
    small: list[str] = []
    for c, r in stats.items():
        n, nn = r["n_rows"], r["n_rows"] - r["n_null"]
        if n == 0:
            continue
        dtype = r["dtype"]
        if r["n_null"] == 0:
            out.append((c, "not_null", f"{_qname(c)} IS NULL",
                        "{}", f"nulls=0 of {n}", True))
        else:
            rate = r["n_null"] / n
            base = part_max_rate.get(c, rate)
            ceil = min(1.0, base * config.null_headroom)
            # raw repr, not a rounded format: truncating a tiny ceiling
            # to 0 would make the check fail on its own source data
            out.append((c, "null_rate_max", f"{_qname(c)} IS NULL",
                        f'{{"max_rate": {ceil!r}}}',
                        f"null_rate={rate:.6f}", False))
        if c in exact_distinct and exact_distinct[c] == nn:
            out.append((c, "unique", None, "{}",
                        f"distinct={exact_distinct[c]} of {nn} non-null (exact)",
                        True))
        if nn > 0 and r["distinct_est"] <= config.domain_max * config.domain_slack:
            small.append(c)
        # NaN/inf min or max (possible for float columns — Spark sorts
        # NaN greatest) make neither a valid SQL literal nor valid JSON:
        # no bounds suggestions for such a column
        if r["min_num"] is not None and math.isfinite(r["min_num"]) \
                and math.isfinite(r["max_num"]):
            if r["min_num"] >= 0:
                out.append((c, "non_negative", f"{_qname(c)} < 0", "{}",
                            f"min={r['min_num']}", True))
            lo, hi = repr(r["min_num"]), repr(r["max_num"])
            out.append((c, "range",
                        f"{_qname(c)} < {lo} OR {_qname(c)} > {hi}",
                        f'{{"min": {lo}, "max": {hi}}}',
                        f"observed=[{lo}, {hi}]", False))

    # pass 2: exact domains for estimate-gated columns. Column-pruned
    # scan; groupBy bounded by the (small) true domains; row_number cap
    # keeps the driver collect at domain_max+1 values per column even if
    # an estimate lied.
    if small:
        # FloatType domains melt through an explicit double widening:
        # a float's shortest string repr ("0.1") re-parsed as a SQL
        # numeric literal is the DOUBLE 0.1, which != the float 0.1f
        # widened to double (0.10000000149…) — a naive isin check over
        # a float domain would flag 100% of its own source rows. The
        # double-cast string round-trips exactly (Java shortest-repr
        # strings re-parse to the same double), and the emitted
        # predicate compares CAST(col AS DOUBLE) so both sides widen
        # identically.
        def _domain_val(c: str) -> Column:
            if stats[c]["dtype"] == "float":
                return _qcol(c).cast("double").cast("string")
            return _qcol(c).cast("string")

        melted = df.select(
            F.explode(F.array(*[
                F.struct(F.lit(c).alias("column"),
                         _domain_val(c).alias("value"))
                for c in small
            ])).alias("kv")
        ).select("kv.column", "kv.value").filter(F.col("value").isNotNull())
        counts = melted.groupBy("column", "value").agg(
            F.count(F.lit(1)).alias("cnt"))
        w = Window.partitionBy("column").orderBy(
            F.desc("cnt"), F.asc("value"))
        capped = counts.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= config.domain_max + 1)
        by_col: dict[str, list[str]] = {}
        for r in capped.collect():
            by_col.setdefault(r["column"], []).append(r["value"])
        for c in small:
            dom = by_col.get(c, [])
            if not dom or len(dom) > config.domain_max:
                continue  # estimate lied past the cap, or all-null
            dom = sorted(dom)
            if any(_sql_literal(v, stats[c]["dtype"]) is None for v in dom):
                continue  # e.g. NaN in a small float domain: no SQL literal
            lits = ", ".join(_sql_literal(v, stats[c]["dtype"]) for v in dom)
            ref = (f"CAST({_qname(c)} AS DOUBLE)"
                   if stats[c]["dtype"] == "float" else _qname(c))
            out.append((c, "isin",
                        f"{_qname(c)} IS NOT NULL AND "
                        f"{ref} NOT IN ({lits})",
                        '{"domain_size": %d}' % len(dom),
                        "domain=[" + ", ".join(dom) + "]", True))

    out.sort(key=lambda t: (t[0], t[1]))
    return spark.createDataFrame(out, SUGGESTION_SCHEMA)


def to_custom_checks(
    suggestions: DataFrame | list,
    *,
    prefix: str = "sugg",
) -> list[CustomCheck]:
    """Compile suggestion rows into ValidationSuite CustomChecks.

    Rows without a row predicate (kind=unique — covered by the suite's
    exact uniqueness check) are skipped. Check names are
    `{prefix}_{kind}_{column}` with non-identifier characters in the
    column name mapped to '_' (the suite requires bare-identifier check
    names; predicates keep the real name via backticks) — stable across
    runs so checkpoint/resume and verdict history line up run-over-run.
    A null_rate_max suggestion carries its own ceiling into
    CustomCheck.stat_max_rate, so the compiled soft check is judged
    against the SUGGESTED rate, not the suite-global default — the
    hold property (every suggested check passes on its source data)
    survives columns whose null rate exceeds the global ceiling.
    """
    rows = suggestions.collect() if isinstance(suggestions, DataFrame) else suggestions
    # sort before name assignment: collision suffixes ('_'-appended)
    # must not depend on stored row order, which a multi-file parquet
    # read back via runner --checks-from does not guarantee — name
    # stability run-over-run is what keeps checkpoint/verdict history
    # aligned
    rows = sorted(rows, key=lambda r: (r["column"], r["kind"]))
    checks = []
    seen: set[str] = set()
    for r in rows:
        if r["predicate_sql"] is None:
            continue
        safe_col = re.sub(r"[^A-Za-z0-9_]", "_", r["column"])
        name = f"{prefix}_{r['kind']}_{safe_col}"
        while name in seen:  # two columns sanitizing to the same name
            name += "_"
        seen.add(name)
        rate = None
        if not r["hard"]:
            rate = json.loads(r["params"]).get("max_rate")
        checks.append(CustomCheck(
            name=name, predicate=r["predicate_sql"], hard=bool(r["hard"]),
            stat_max_rate=rate,
        ))
    return checks


# ---------------------------------------------------------------------------
# approximate functional dependencies
# ---------------------------------------------------------------------------

#: schema of suggest_fds output
FD_SCHEMA = T.StructType([
    T.StructField("determinant", T.StringType(), False),
    T.StructField("dependent", T.StringType(), False),
    T.StructField("n_groups", T.LongType(), True),
    T.StructField("violating_groups", T.LongType(), True),
    T.StructField("fd_rate", T.DoubleType(), True),
    T.StructField("holds", T.BooleanType(), False),
    T.StructField("checked", T.BooleanType(), False),
])

#: safety factor over the HLL++ rsd (2%) for the cardinality-pruning
#: inequality — wide enough that estimate noise can't prune a pair the
#: exact check would accept
_FD_PRUNE_SLACK = 1.1


def suggest_fds(
    df: DataFrame,
    pairs: list[tuple[str, str]] | None = None,
    *,
    max_violation_rate: float = 0.0,
    max_determinant_distinct: int = 1_000_000,
    max_pairs: int = 256,
    profile: DataFrame | None = None,
) -> DataFrame:
    """Approximate functional-dependency discovery: does A determine B?

    A pair (A, B) HOLDS when every non-null A-value maps to exactly one
    distinct B-value; `fd_rate` is the fraction of A-groups with >1
    distinct B (0.0 = exact FD), and `holds` is fd_rate <=
    max_violation_rate. Discovered FDs are validation material: a later
    snapshot where `source_id -> source_name` breaks usually means a
    bad join or a corrupted dimension upstream.

    Plan: all candidate pairs melt into ONE (pair, a, b) frame computed
    in a single scan, so every pair is measured simultaneously — never a
    per-pair scan. The aggregation cascade (verified via explain) has
    exactly one row-scale exchange: map-side partial-dedup on
    (pair, a, b) bounds what it carries at the distinct-combination
    count; the (pair, a) distinct-b count and the |pairs|-row final
    roll-up shuffle strictly shrinking frames that AQE coalesces — the
    same cascade shape as the engine's uniqueness check. Columns whose
    profile estimates more
    distinct values than `max_determinant_distinct` are skipped as
    determinants: an FD keyed on a near-unique column is vacuous AND its
    group count approaches the row count.

    Cardinality pruning (`checked` = false rows): an exact FD A -> B
    forces distinct(B) <= distinct(A) (each A-group contributes one B
    value), so when max_violation_rate == 0 any pair whose dependent
    estimate exceeds the determinant estimate (x a slack covering the
    2% rsd) is settled as holds=false FROM THE PROFILE ALONE — no data
    pass, no melt rows, no dedup hash-map entries. This is what keeps
    the operator viable at corpus scale: without it a near-unique
    dependent (a doc_id column, say) drags O(rows) distinct
    (pair, a, b) combinations through the exchange for a pair that
    provably cannot hold. Two soundness conditions, both enforced: the
    argument only binds at rate 0 (violating groups may carry
    unboundedly many B values under a tolerance), and only when the
    DETERMINANT has no nulls — the FD is evaluated over non-null-A rows
    while the profile's distinct(B) is global, so B values living on
    null-A rows could otherwise inflate the estimate past a
    truly-holding pair.

    The profile scan (when not supplied) is column-pruned to the
    columns the call actually consults. Requested pairs whose
    determinant has no non-null rows produce an explicit vacuous
    verdict (n_groups=0, holds=true) rather than silently vanishing.

    pairs=None tries every ordered pair of profilable columns —
    quadratic in |cols|, fine for the tens-of-columns tables this
    engine validates; pass explicit pairs beyond that. `max_pairs`
    makes the bound ENFORCED, in the style of the engine's other caps:
    if more than max_pairs candidate pairs survive cardinality
    pruning, the call raises instead of silently melting an
    amplification factor that large through one exchange.
    """
    spark = df.sparkSession
    pcols = [c for c, _ in _profilable(df, None)]
    if pairs is not None:
        for a, b in pairs:
            if a not in df.columns or b not in df.columns:
                raise ValueError(f"FD pair references missing column: ({a}, {b})")
    need_cols = (
        pcols if pairs is None
        else sorted({c for p in pairs for c in p if c in dict(
            _profilable(df, None))})
    )
    prof = profile if profile is not None else column_profile(df, need_cols)
    prof_rows = prof.collect()
    est = {r["column"]: r["distinct_est"] for r in prof_rows}
    nulls = {r["column"]: r["n_null"] for r in prof_rows}
    if pairs is None:
        dets = [c for c in pcols if est.get(c, 0) <= max_determinant_distinct]
        pairs = [(a, b) for a in dets for b in pcols if a != b]
    if not pairs:
        return spark.createDataFrame([], FD_SCHEMA)

    pruned: list[tuple[str, str]] = []
    if max_violation_rate == 0:
        live = []
        for a, b in pairs:
            if (a in est and b in est
                    and nulls.get(a, 1) == 0
                    and est[b] > est[a] * _FD_PRUNE_SLACK):
                pruned.append((a, b))
            else:
                live.append((a, b))
        pairs = live
    pruned_df = spark.createDataFrame(
        [(a, b, None, None, None, False, False) for a, b in pruned],
        FD_SCHEMA)
    if not pairs:
        return pruned_df.orderBy("determinant", "dependent")
    # enforced (not just documented) bound on the melt fan-out: every
    # live pair multiplies the scanned rows by one in the explode, so
    # |live pairs| IS the scan-amplification factor
    if len(pairs) > max_pairs:
        raise ValueError(
            f"{len(pairs)} candidate FD pairs survive cardinality "
            f"pruning (> max_pairs={max_pairs}); each live pair "
            "multiplies the melted scan rows by one. Pass explicit "
            "`pairs` for the hypotheses you care about, lower "
            "`max_determinant_distinct`, or raise `max_pairs` only if "
            "the scan amplification is genuinely acceptable")

    melted = df.select(
        F.explode(F.array(*[
            F.struct(
                F.lit(a).alias("det"),
                F.lit(b).alias("dep"),
                _qcol(a).cast("string").alias("a"),
                _qcol(b).cast("string").alias("b"),
            )
            for a, b in pairs
        ])).alias("kv")
    ).select("kv.det", "kv.dep", "kv.a", "kv.b").filter(F.col("a").isNotNull())

    # null dependents don't violate (count_distinct skips nulls; the
    # completeness checks own the null question)
    per_group = (
        melted.groupBy("det", "dep", "a")
        .agg(F.count_distinct("b").alias("nb"))
    )
    rolled = per_group.groupBy("det", "dep").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("nb") > 1).cast("long")).alias("violating_groups"),
    )
    # a determinant with zero non-null rows contributes no melt rows —
    # left-join the (tiny) pair list back so the pair still gets an
    # explicit vacuous verdict instead of vanishing
    pairs_df = spark.createDataFrame(pairs, ["det", "dep"])
    rolled = pairs_df.join(F.broadcast(rolled), ["det", "dep"], "left").fillna(
        {"n_groups": 0, "violating_groups": 0}
    )
    rate = F.col("violating_groups") / F.greatest(F.col("n_groups"), F.lit(1))
    out = rolled.select(
        F.col("det").alias("determinant"),
        F.col("dep").alias("dependent"),
        "n_groups",
        "violating_groups",
        rate.cast("double").alias("fd_rate"),
        (rate <= F.lit(max_violation_rate)).alias("holds"),
        F.lit(True).alias("checked"),
    )
    return out.unionByName(pruned_df).orderBy("determinant", "dependent")


# ---------------------------------------------------------------------------
# snapshot diff
# ---------------------------------------------------------------------------

#: schema of snapshot_diff output
DIFF_SCHEMA = T.StructType([
    T.StructField("column", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("old_value", T.StringType(), True),
    T.StructField("new_value", T.StringType(), True),
    T.StructField("severity", T.StringType(), False),
])


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    null_rate_tol: float = 0.01,
    density_ratio_tol: float = 2.0,
    row_ratio_tol: float = 2.0,
) -> DataFrame:
    """Schema + distribution changes between two profile snapshots.

    Pure DataFrame logic over two |cols|-row frames (a full-outer join
    plus column expressions — no scan of either underlying table).

    Change kinds (severity hard/info):
      column_added / column_removed     hard
      type_changed                      hard
      null_rate_shift                   |Δ null_rate| > null_rate_tol (info)
      bounds_escape                     numeric [min,max] left the old
                                        interval (info)
      distinct_density_shift            distinct/non-null ratio moved by
                                        more than density_ratio_tol x (info)
      row_count_shift (column='*')      row count moved by more than
                                        row_ratio_tol x (info)
    """
    o = old.select([F.col(c).alias(f"o_{c}") for c in old.columns])
    n = new.select([F.col(c).alias(f"n_{c}") for c in new.columns])
    j = o.join(n, o["o_column"] == n["n_column"], "full_outer")

    col = F.coalesce(F.col("o_column"), F.col("n_column"))
    o_nn = (F.col("o_n_rows") - F.col("o_n_null")).cast("double")
    n_nn = (F.col("n_n_rows") - F.col("n_n_null")).cast("double")
    o_rate = F.col("o_n_null") / F.greatest(F.col("o_n_rows"), F.lit(1))
    n_rate = F.col("n_n_null") / F.greatest(F.col("n_n_rows"), F.lit(1))
    o_dens = F.col("o_distinct_est") / F.greatest(o_nn, F.lit(1.0))
    n_dens = F.col("n_distinct_est") / F.greatest(n_nn, F.lit(1.0))
    dens_ratio = F.greatest(o_dens, n_dens) / F.greatest(
        F.least(o_dens, n_dens), F.lit(1e-12))

    changes = j.select(
        col.alias("column"),
        F.array_compact(F.array(
            F.when(F.col("o_column").isNull(), F.struct(
                F.lit("column_added").alias("kind"),
                F.lit(None).cast("string").alias("old_value"),
                F.col("n_dtype").alias("new_value"),
                F.lit("hard").alias("severity"))),
            F.when(F.col("n_column").isNull(), F.struct(
                F.lit("column_removed").alias("kind"),
                F.col("o_dtype").alias("old_value"),
                F.lit(None).cast("string").alias("new_value"),
                F.lit("hard").alias("severity"))),
            F.when(
                F.col("o_column").isNotNull() & F.col("n_column").isNotNull()
                & (F.col("o_dtype") != F.col("n_dtype")),
                F.struct(
                    F.lit("type_changed").alias("kind"),
                    F.col("o_dtype").alias("old_value"),
                    F.col("n_dtype").alias("new_value"),
                    F.lit("hard").alias("severity"))),
            F.when(
                F.col("o_column").isNotNull() & F.col("n_column").isNotNull()
                & (F.abs(n_rate - o_rate) > F.lit(null_rate_tol)),
                F.struct(
                    F.lit("null_rate_shift").alias("kind"),
                    F.format_number(o_rate, 6).alias("old_value"),
                    F.format_number(n_rate, 6).alias("new_value"),
                    F.lit("info").alias("severity"))),
            F.when(
                F.col("o_min_num").isNotNull() & F.col("n_min_num").isNotNull()
                & ((F.col("n_min_num") < F.col("o_min_num"))
                   | (F.col("n_max_num") > F.col("o_max_num"))),
                F.struct(
                    F.lit("bounds_escape").alias("kind"),
                    F.concat(F.lit("["), F.col("o_min_num").cast("string"),
                             F.lit(", "), F.col("o_max_num").cast("string"),
                             F.lit("]")).alias("old_value"),
                    F.concat(F.lit("["), F.col("n_min_num").cast("string"),
                             F.lit(", "), F.col("n_max_num").cast("string"),
                             F.lit("]")).alias("new_value"),
                    F.lit("info").alias("severity"))),
            F.when(
                F.col("o_column").isNotNull() & F.col("n_column").isNotNull()
                & (o_nn > 0) & (n_nn > 0)
                & (dens_ratio > F.lit(density_ratio_tol)),
                F.struct(
                    F.lit("distinct_density_shift").alias("kind"),
                    F.format_number(o_dens, 6).alias("old_value"),
                    F.format_number(n_dens, 6).alias("new_value"),
                    F.lit("info").alias("severity"))),
        )).alias("cs"),
    ).select("column", F.explode("cs").alias("c")).select(
        "column", "c.kind", "c.old_value", "c.new_value", "c.severity")

    # row-count swing: one synthetic '*' row from the snapshot heads
    o_rows = old.select(F.max("n_rows")).collect()
    n_rows = new.select(F.max("n_rows")).collect()
    o_cnt = o_rows[0][0] if o_rows and o_rows[0][0] is not None else 0
    n_cnt = n_rows[0][0] if n_rows and n_rows[0][0] is not None else 0
    spark = old.sparkSession
    extra = []
    hi, lo = max(o_cnt, n_cnt), min(o_cnt, n_cnt)
    # lo == 0 with hi > 0 (empty -> populated or the reverse) is the
    # most extreme swing possible, not a case to stay silent on
    if hi > 0 and (lo == 0 or hi / lo > row_ratio_tol):
        extra.append(("*", "row_count_shift", str(o_cnt), str(n_cnt), "info"))
    extra_df = spark.createDataFrame(extra, DIFF_SCHEMA)
    return changes.unionByName(extra_df).orderBy("column", "kind")


# ---------------------------------------------------------------------------
# grouped (per-key) suggestion
# ---------------------------------------------------------------------------

#: schema of suggest_grouped_checks output
GROUPED_SUGGESTION_SCHEMA = T.StructType([
    T.StructField("group", T.StringType(), False),
    T.StructField("column", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("params", T.StringType(), False),
    T.StructField("evidence", T.StringType(), False),
])


def suggest_grouped_checks(
    df: DataFrame,
    group_col: str,
    cols: list[str],
    *,
    max_groups: int = 1000,
) -> DataFrame:
    """Per-group numeric bounds + null-rate suggestions — constraints a
    GLOBAL profile cannot express. In a mixed corpus, 3000 tokens is a
    legitimate length for `books` and an anomaly for `forums`; a global
    range check passes both, a per-source range catches the second.

    ONE groupBy(group_col) wide agg produces a |groups| x |cols| stats
    frame (per-group count / nulls / min / max for each column);
    suggestions derive from that frame alone. A guard raises when the
    group count exceeds `max_groups` — per-group constraints over a
    high-cardinality key are a modeling error (and an unbounded driver
    collect), not something to attempt silently.

    Emits per (group, column): `grp_range` (observed [min, max]) and
    `grp_null_rate` (observed rate) rows. Compile with
    `grouped_to_custom_checks`, which fuses each (column, kind) family
    into ONE CustomCheck whose predicate is a when-chain over groups —
    so a 50-group table adds two checks per column to the verdict
    board, not a hundred, and the marking scan stays single-pass.
    """
    spark = df.sparkSession
    fields = {f.name: f.dataType for f in df.schema.fields}
    if group_col not in fields:
        raise ValueError(f"group column {group_col!r} not in frame")
    for c in cols:
        if c not in fields:
            raise ValueError(f"column {c!r} not in frame")
        if not isinstance(fields[c], _NUMERIC):
            raise ValueError(
                f"suggest_grouped_checks needs numeric columns; {c!r} is "
                f"{fields[c].simpleString()}")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = _qcol(c)
        aggs += [
            F.count(col).alias(f"nn_{c}"),
            F.min(col).cast("double").alias(f"lo_{c}"),
            F.max(col).cast("double").alias(f"hi_{c}"),
        ]
    # the group-count guard rides the SAME single agg scan: collecting
    # at most max_groups+1 aggregated rows bounds the driver exactly
    # (no separate distinct-count pass over the input, no rsd error)
    stats = (
        df.filter(_qcol(group_col).isNotNull())
        .groupBy(_qcol(group_col).cast("string").alias("g"))
        .agg(*aggs)
        .limit(max_groups + 1)
        .collect()
    )
    if len(stats) > max_groups:
        raise ValueError(
            f"{group_col!r} has more than max_groups={max_groups} groups; "
            "per-group constraints over a high-cardinality key are a "
            "modeling error — raise max_groups only if the group count is "
            "genuinely bounded")
    out = []
    for r in stats:
        g, n = r["g"], r["__n"]
        for c in cols:
            lo, hi = r[f"lo_{c}"], r[f"hi_{c}"]
            if lo is not None and math.isfinite(lo) and math.isfinite(hi):
                out.append((g, c, "grp_range",
                            f'{{"min": {lo!r}, "max": {hi!r}}}',
                            f"observed=[{lo!r}, {hi!r}] over {n} rows"))
            rate = (n - r[f"nn_{c}"]) / n if n else 0.0
            out.append((g, c, "grp_null_rate",
                        f'{{"rate": {rate!r}}}',
                        f"nulls={n - r[f'nn_{c}']} of {n}"))
    out.sort()
    return spark.createDataFrame(out, GROUPED_SUGGESTION_SCHEMA)


def _bounds_udf_predicate(group_col: str, value_col: str, arms: list) -> Column:
    """Bounds-as-data variant of the grouped range chain: the per-group
    [min, max] table lives in the closure of ONE vectorized Arrow UDF,
    so generated code stays O(1) no matter the group count. Exactly the
    chain's semantics: unseen/null group -> no bounds -> pass; null
    value -> NaN comparisons -> pass."""
    lo = {r["group"]: json.loads(r["params"])["min"] for r in arms}
    hi = {r["group"]: json.loads(r["params"])["max"] for r in arms}

    @F.pandas_udf(T.BooleanType())
    def _flag(g: pd.Series, v: pd.Series) -> pd.Series:
        gl = g.map(lo)
        gh = g.map(hi)
        return (v < gl) | (v > gh)

    return _flag(_qcol(group_col).cast("string"),
                 _qcol(value_col).cast("double"))


def grouped_to_custom_checks(
    suggestions: DataFrame | list,
    group_col: str,
    *,
    prefix: str = "sugg_grp",
    null_headroom: float = 1.5,
    stat_max_rate_floor: float = 0.0,
    max_arms_per_check: int = 128,
) -> list[CustomCheck]:
    """One fused CustomCheck per (column, kind) family, with a measured
    codegen ceiling and a bounds-as-DATA escape hatch above it.

    Janino's 64 KB generated-method limit is real for long when-chains:
    measured on this engine (Spark 4.1, codegen fallback disabled), a
    single CASE over ~192 group arms still compiles while ~384 fails —
    and chains fused beside OTHER checks in the same Project share the
    method budget, so even several sub-192 chains together can push the
    whole marking stage onto the silent interpreted fallback (measured
    ~6x slower at 1000 groups). Families with at most
    `max_arms_per_check` groups (default 128 — ~2/3 of the measured
    single-chain boundary, leaving budget for the rest of the fused
    scan) compile to the plain when-chain. Larger families switch
    representation instead of growing code: the per-group bounds become
    a dict inside ONE vectorized Arrow pandas UDF (the marking engine's
    existing arrow family pattern), so generated-code size is O(1) in
    the group count, the check name stays the unsuffixed family name,
    and flag semantics are row-for-row identical to the chain (absent
    group -> pass, null value -> pass). The UDF path trades pure
    codegen for an Arrow transfer of exactly two columns — the right
    trade once bounds stop being plan-literal-sized.

    grp_range  -> HARD check: when-chain over groups, each arm the
                  group's observed-bounds violation predicate; rows in
                  groups unseen at suggestion time don't flag (their
                  arm is absent -> NULL -> pass; the GLOBAL isin check
                  owns novel groups).
    grp_null_rate -> SOFT check flagging nulls per row (scoped to
                  non-null groups, matching the stats' scope — a null
                  group key is the global completeness checks'
                  business), with stat_max_rate = max over groups of
                  (rate * null_headroom, floor) — the verdict rule is
                  per-partition, so the ceiling takes the laxest group
                  (per-group verdict granularity would need per-group
                  partitions, which is exactly how the suite's
                  partition column is meant to be laid out).

    Raises on a frame with no grouped suggestion rows (e.g. a plain
    suggest_checks parquet passed by mistake) — a validation run that
    silently compiles zero checks is a misconfiguration, not a pass.
    """
    rows = (suggestions.collect()
            if isinstance(suggestions, DataFrame) else suggestions)
    known = {"grp_range", "grp_null_rate"}
    if not any(r["kind"] in known for r in rows):
        raise ValueError(
            "no grouped suggestion rows (kinds grp_range/grp_null_rate) "
            "found — is this a suggest_grouped_checks output?")
    by_col_range: dict[str, list] = {}
    by_col_rate: dict[str, float] = {}
    for r in rows:
        if r["kind"] == "grp_range":
            by_col_range.setdefault(r["column"], []).append(r)
        elif r["kind"] == "grp_null_rate":
            rate = json.loads(r["params"])["rate"]
            by_col_rate[r["column"]] = max(
                by_col_rate.get(r["column"], 0.0), rate)
    checks = []
    seen: set[str] = set()

    def name_for(kind: str, c: str) -> str:
        n = f"{prefix}_{kind}_" + re.sub(r"[^A-Za-z0-9_]", "_", c)
        while n in seen:
            n += "_"
        seen.add(n)
        return n

    for c, arms in sorted(by_col_range.items()):
        arms = sorted(arms, key=lambda x: x["group"])
        base = name_for("range", c)
        if len(arms) <= max_arms_per_check:
            whens = " ".join(
                f"WHEN {_sql_literal(r['group'], 'string')} THEN "
                f"({_qname(c)} < {json.loads(r['params'])['min']!r} OR "
                f"{_qname(c)} > {json.loads(r['params'])['max']!r})"
                for r in arms
            )
            checks.append(CustomCheck(
                name=base,
                predicate=f"CASE {_qname(group_col)} {whens} END",
                hard=True,
            ))
        else:
            checks.append(CustomCheck(
                name=base,
                predicate=_bounds_udf_predicate(group_col, c, arms),
                hard=True,
            ))
    for c, rate in sorted(by_col_rate.items()):
        checks.append(CustomCheck(
            name=name_for("null_rate", c),
            predicate=f"{_qname(group_col)} IS NOT NULL AND {_qname(c)} IS NULL",
            hard=False,
            stat_max_rate=max(min(1.0, rate * null_headroom),
                              stat_max_rate_floor),
        ))
    return checks
