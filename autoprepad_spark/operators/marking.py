"""Row-level constraint marking — the engine's "transform" stage.

The reference marks outliers per row with whole-table pandas transforms
(TukeyTransformer.py:54 `(X < lower) | (X > upper)`,
MedianAbsolutDeviation.py:53-61 modified Z with 0.6745 / 3.5,
ZTransformerMean.py:47-58 z-score with threshold 3, ddof=1) and counts
flags per row (TukeyTransformerTotal.py:25-36 row-wise sum).

Two interchangeable predicate engines produce IDENTICAL flags:

* ``arrow``  (default) — one vectorized pandas/Arrow UDF evaluates every
  row-level predicate over Arrow record batches: numpy/pyarrow kernels
  only, no per-row Python (north-rule requirement). Token-array
  structure checks use ListArray offsets + ``np.maximum.reduceat`` so the
  nested column is traversed once, vectorized.
* ``native`` — the same predicates as Catalyst Column expressions
  (whole-stage codegen; fastest JVM path, used as the cross-check).

Fit statistics arrive as plain floats (broadcast as literals into the
plan) — the marking pass is a pure map, no shuffle, and preserves the
input columns untouched (token-array equality invariant).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame, Column, functions as F, types as T

from autoprepad_spark.datagen import VOCAB_SIZE
from autoprepad_spark.operators.profile import ProfileStats

MAD_SCALE = 0.6745  # MedianAbsolutDeviation.py:56
MAD_THRESHOLD = 3.5  # MedianAbsolutDeviation.py:36
Z_THRESHOLD = 3.0  # ZTransformerMean.py:32
TUKEY_FACTOR = 1.5  # TukeyTransformer.py:33

#: check-name -> flag column (order defines severity tie-break ordering)
ROW_CHECKS = [
    "null_doc_id",
    "len_mismatch",
    "token_oob",
    "empty_tokens",
    "ntok_tukey",
    "ntok_mad",
    "ntok_z",
]
FLAG_COLS = [f"f_{c}" for c in ROW_CHECKS]
#: referential check, inlined into the marking pass when the allowed-set
#: is small enough to ship as a literal (the common dimension-table case)
REF_CHECK = "ref_source"
REF_FLAG = f"f_{REF_CHECK}"

_CHECK_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


@dataclass(frozen=True, eq=False)
class CustomCheck:
    """User-defined row constraint — the engine's extensibility point
    (the reference exposes this axis as pluggable sklearn transformers,
    pipelines/control.py:153-154; here a constraint is a declarative
    Column predicate, so Catalyst fuses it into the SAME marking scan
    as the built-in checks — no extra pass over the table, even for
    predicates over the heavy ``tokens`` payload).

    name       check_name in violations/verdicts; must be a bare
               identifier and must not collide with a built-in check.
    predicate  boolean Column or SQL expression string; True marks the
               row as a VIOLATION. NULL counts as pass (wrap the
               expression in coalesce yourself to invert that).
    detail     optional Column / SQL string for the violation row's
               ``detail`` payload (cast to string); defaults to n_tok.
    hard       True: any violation fails the partition (HARD_CHECKS
               rule). False: statistical rule — the partition passes
               while the violation RATE stays <= the suite's
               stat_max_rate.
    stat_max_rate  optional per-check ceiling for the statistical rule,
               overriding the suite-global value for THIS check only
               (e.g. a suggested null-rate ceiling derived from the
               observed rate). Ignored when hard=True.

    Predicates evaluate JVM-side (whole-stage codegen) regardless of
    the suite's marking engine, so arrow and native runs produce
    identical custom flags. Expressions may reference any input column,
    including extra columns beyond the declared schema."""

    name: str
    predicate: Column | str
    detail: Column | str | None = None
    hard: bool = True
    stat_max_rate: float | None = None

    def flag_col(self) -> Column:
        p = (
            F.expr(self.predicate)
            if isinstance(self.predicate, str)
            else self.predicate
        )
        return F.coalesce(p.cast("int"), F.lit(0))

    def detail_col(self) -> Column | None:
        if self.detail is None:
            return None
        d = F.expr(self.detail) if isinstance(self.detail, str) else self.detail
        return d.cast("string")


def validate_custom_checks(custom: list[CustomCheck] | None) -> list[CustomCheck]:
    """Reject name collisions (with built-ins or each other) and names
    that cannot be column suffixes. Returns the list for chaining."""
    if not custom:
        return []
    reserved = set(ROW_CHECKS) | {REF_CHECK, "unique_doc_id"}
    seen: set[str] = set()
    for c in custom:
        if not _CHECK_NAME_RE.match(c.name):
            raise ValueError(
                f"custom check name {c.name!r} must be a bare identifier"
            )
        if c.name in reserved:
            raise ValueError(
                f"custom check name {c.name!r} collides with a built-in check"
            )
        if c.name in seen:
            raise ValueError(f"duplicate custom check name {c.name!r}")
        seen.add(c.name)
    return list(custom)


def _flags_numpy(
    doc_null: np.ndarray,
    lengths: np.ndarray,  # -1 where tokens column itself is null
    tok_min: np.ndarray,
    tok_max: np.ndarray,
    n_tok: np.ndarray,  # NaN where null
    stats: ProfileStats,
    vocab_size: int,
) -> dict[str, np.ndarray]:
    """Shared vectorized predicate kernel (numpy; used by the arrow engine)."""
    lo, hi = stats.tukey_bounds
    out: dict[str, np.ndarray] = {}
    out["f_null_doc_id"] = doc_null.astype(np.int32)
    with np.errstate(invalid="ignore"):
        out["f_len_mismatch"] = (lengths != np.nan_to_num(n_tok, nan=-1.0)).astype(np.int32)
        has = lengths > 0
        out["f_token_oob"] = (has & ((tok_min < 0) | (tok_max >= vocab_size))).astype(np.int32)
        out["f_empty_tokens"] = (lengths == 0).astype(np.int32)
        out["f_ntok_tukey"] = ((n_tok < lo) | (n_tok > hi)).astype(np.int32)
        if stats.mad_n_tok > 0:  # zero-MAD guard, MedianAbsolutDeviation.py:44-45
            zmod = MAD_SCALE * (n_tok - stats.median_n_tok) / stats.mad_n_tok
            out["f_ntok_mad"] = (np.abs(zmod) > MAD_THRESHOLD).astype(np.int32)
        else:
            out["f_ntok_mad"] = np.zeros(len(n_tok), dtype=np.int32)
        if stats.std_n_tok > 0:  # zero-std guard, ZTransformerMean.py:50-51
            z = (n_tok - stats.mean_n_tok) / stats.std_n_tok
            out["f_ntok_z"] = (np.abs(z) > Z_THRESHOLD).astype(np.int32)
        else:
            out["f_ntok_z"] = np.zeros(len(n_tok), dtype=np.int32)
    return out


def _list_stats(tokens: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """lengths / per-list min / per-list max via Arrow offsets (vectorized)."""
    arr = pa.array(tokens, type=pa.list_(pa.int64()))
    n = len(arr)
    lengths = pc.list_value_length(arr)
    lengths = np.asarray(lengths.fill_null(-1), dtype=np.int64)
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    tok_min = np.zeros(n, dtype=np.float64)
    tok_max = np.zeros(n, dtype=np.float64)
    if flat.size:
        starts = np.clip(offsets[:-1], 0, flat.size - 1)
        mins = np.minimum.reduceat(flat, starts)
        maxs = np.maximum.reduceat(flat, starts)
        has = lengths > 0
        tok_min[has] = mins[has]
        tok_max[has] = maxs[has]
    return lengths, tok_min, tok_max


def _pack_flags(out: dict[str, np.ndarray]) -> np.ndarray:
    """Pack the per-check 0/1 arrays into one int32 bitmask (bit i =
    ROW_CHECKS[i]) — a single narrow Arrow column back to the JVM instead
    of a 7-field struct (struct-returning pandas UDFs serialize each
    field and build per-field Series; the bitmask measures ~25% faster
    end-to-end on the marking stage at high parallelism)."""
    packed = np.zeros(len(next(iter(out.values()))), dtype=np.int32)
    for i, f in enumerate(FLAG_COLS):
        packed |= out[f].astype(np.int32) << i
    return packed


def _arrow_array_flag_udf(stats: ProfileStats, vocab_size: int):
    """pyarrow-native variant (Spark 4 ``arrow_udf``): batches arrive as
    ``pa.Array`` — no pandas Series/index construction on either side of
    the exchange, the remaining per-batch cost is pure numpy. Same
    packed-bitmask output as the pandas variant."""

    @F.arrow_udf(T.IntegerType())
    def flags(
        doc_null: pa.Array, length: pa.Array, tmin: pa.Array,
        tmax: pa.Array, n_tok: pa.Array,
    ) -> pa.Array:
        dn = doc_null.to_numpy(zero_copy_only=False).astype(bool)
        lengths = pc.fill_null(length, -1).to_numpy(zero_copy_only=False)
        tok_min = pc.fill_null(tmin, 0.0).to_numpy(zero_copy_only=False)
        tok_max = pc.fill_null(tmax, 0.0).to_numpy(zero_copy_only=False)
        nt = pc.fill_null(n_tok, float("nan")).to_numpy(zero_copy_only=False)
        out = _flags_numpy(dn, lengths, tok_min, tok_max, nt, stats, vocab_size)
        return pa.array(_pack_flags(out), type=pa.int32())

    return flags


def _arrow_flag_udf(stats: ProfileStats, vocab_size: int):
    """Scalar-feed Arrow UDF: all predicates evaluate vectorized in Python
    over Arrow batches, but the token-array reductions (size/min/max) are
    computed JVM-side first so the heavy ``tokens`` column never crosses
    the JVM->Python boundary. At 10^12 rows this is the difference between
    shipping ~5 doubles/row and shipping the whole token payload (~200
    int32s/row) through Arrow. Returns a packed flag bitmask (one int32
    per row); the JVM unpacks bits with shiftright/bit_count."""

    @F.pandas_udf(T.IntegerType())
    def flags(
        doc_null: pd.Series, length: pd.Series, tmin: pd.Series,
        tmax: pd.Series, n_tok: pd.Series,
    ) -> pd.Series:
        lengths = length.to_numpy(dtype=np.int64, na_value=-1)
        tok_min = tmin.to_numpy(dtype=np.float64, na_value=0.0)
        tok_max = tmax.to_numpy(dtype=np.float64, na_value=0.0)
        nt = n_tok.to_numpy(dtype=np.float64, na_value=np.nan)
        out = _flags_numpy(
            doc_null.to_numpy(dtype=bool), lengths, tok_min, tok_max,
            nt, stats, vocab_size,
        )
        return pd.Series(_pack_flags(out))

    return flags


def _arrow_deep_flag_udf(stats: ProfileStats, vocab_size: int):
    """Deep variant: the token arrays themselves cross into Python and are
    reduced with Arrow ListArray offsets + np.reduceat. Kept as a parity
    cross-check for the scalar-feed path (and for callers that need custom
    per-token predicates Python-side)."""

    @F.pandas_udf(T.IntegerType())
    def flags(doc_id: pd.Series, tokens: pd.Series, n_tok: pd.Series) -> pd.Series:
        lengths, tok_min, tok_max = _list_stats(tokens)
        nt = n_tok.to_numpy(dtype=np.float64, na_value=np.nan)
        out = _flags_numpy(
            doc_id.isna().to_numpy(), lengths, tok_min, tok_max, nt, stats, vocab_size
        )
        return pd.Series(_pack_flags(out))

    return flags


def _native_flag_cols(stats: ProfileStats, vocab_size: int) -> dict[str, Column]:
    lo, hi = stats.tukey_bounds
    nt = F.col("n_tok").cast("double")
    size = F.coalesce(F.size("tokens"), F.lit(-1))
    cols: dict[str, Column] = {
        "f_null_doc_id": F.isnull("doc_id").cast("int"),
        "f_len_mismatch": F.coalesce(
            (size != F.coalesce(nt, F.lit(-1.0))).cast("int"), F.lit(1)
        ),
        "f_token_oob": F.coalesce(
            (
                (size > 0)
                & ((F.array_min("tokens") < 0) | (F.array_max("tokens") >= vocab_size))
            ).cast("int"),
            F.lit(0),
        ),
        "f_empty_tokens": (size == 0).cast("int"),
        "f_ntok_tukey": F.coalesce(((nt < lo) | (nt > hi)).cast("int"), F.lit(0)),
    }
    if stats.mad_n_tok > 0:
        zmod = MAD_SCALE * (nt - stats.median_n_tok) / stats.mad_n_tok
        cols["f_ntok_mad"] = F.coalesce((F.abs(zmod) > MAD_THRESHOLD).cast("int"), F.lit(0))
    else:
        cols["f_ntok_mad"] = F.lit(0)
    if stats.std_n_tok > 0:
        z = (nt - stats.mean_n_tok) / stats.std_n_tok
        cols["f_ntok_z"] = F.coalesce((F.abs(z) > Z_THRESHOLD).cast("int"), F.lit(0))
    else:
        cols["f_ntok_z"] = F.lit(0)
    return cols


def mark_slim(
    df: DataFrame,
    stats: ProfileStats,
    *,
    vocab_size: int = VOCAB_SIZE,
    allowed_sources: list[str] | None = None,
    custom: list[CustomCheck] | None = None,
) -> DataFrame:
    """Marking pass for the validation plan: flags + array diagnostics,
    NO token passthrough — (part, doc_id, n_tok, source, _len, _tmin,
    _tmax, f_*, flag_total).

    Why this exists: a scalar pandas UDF buffers its child's FULL rows
    in a JVM-side queue while Arrow batches round-trip to python
    (ArrowEvalPythonExec). When the UDF arguments are expressions over
    ``tokens`` (or single-use projected aliases — CollapseProject
    inlines those right back), the heavy token arrays (~800B/row) land
    in that queue, dominating GC and memory bandwidth at high
    parallelism. Here the token-array reductions (size/min/max) are
    projected ONCE below the UDF and referenced TWICE above it — as UDF
    arguments AND as retained diagnostic columns (they become the
    violation ``detail`` payload) — which blocks CollapseProject from
    re-inlining non-cheap expressions, so Catalyst prunes ``tokens``
    out of the plan right after the reduction projection: the python
    queue holds ~60B/row instead of ~800B. Predicates still evaluate
    vectorized in python over Arrow batches (north-rule contract).

    Flags are bit-identical to mark(engine="arrow")'s.

    custom: extra CustomCheck constraints. Their predicates (and detail
    expressions) are computed in the SAME projection as the built-in
    token-array reductions — JVM codegen in the one pass that reads the
    payload — then the flag/detail columns ride above the Arrow UDF
    like the other diagnostics, so ``tokens`` is still pruned out of
    the python exchange.
    """
    custom = validate_custom_checks(custom)
    custom_cols = []
    for c in custom:
        custom_cols.append(c.flag_col().alias(f"f_{c.name}"))
        d = c.detail_col()
        if d is not None:
            custom_cols.append(d.alias(f"_d_{c.name}"))
    slim = df.select(
        "part",
        "doc_id",
        "n_tok",
        "source",
        F.isnull("doc_id").alias("_dn"),
        F.coalesce(F.size("tokens"), F.lit(-1)).cast("long").alias("_len"),
        F.array_min("tokens").cast("double").alias("_tmin"),
        F.array_max("tokens").cast("double").alias("_tmax"),
        F.col("n_tok").cast("double").alias("_ntd"),
        *custom_cols,
    )
    udf = _arrow_array_flag_udf(stats, vocab_size)
    custom_names = [f.name for f in custom]
    custom_keep = [f"f_{n}" for n in custom_names] + [
        f"_d_{n}" for n in custom_names if f"_d_{n}" in slim.columns
    ]
    out = slim.select(
        "part",
        "doc_id",
        "n_tok",
        "source",
        "_len",
        "_tmin",
        "_tmax",
        *custom_keep,
        udf("_dn", "_len", "_tmin", "_tmax", "_ntd").alias("_flags"),
    )
    for i, f in enumerate(FLAG_COLS):
        out = out.withColumn(f, F.shiftright("_flags", i).bitwiseAND(F.lit(1)))
    out = out.drop("_flags")
    flag_cols = list(FLAG_COLS) + [f"f_{n}" for n in custom_names]
    if allowed_sources is not None:
        out = out.withColumn(
            REF_FLAG,
            (
                F.col("source").isNotNull()
                & ~F.col("source").isin(*allowed_sources)
            ).cast("int"),
        )
        flag_cols.append(REF_FLAG)
    total = None
    for f in flag_cols:
        total = F.col(f) if total is None else total + F.col(f)
    return out.withColumn("flag_total", total.cast("int"))


def mark(
    df: DataFrame,
    stats: ProfileStats,
    *,
    vocab_size: int = VOCAB_SIZE,
    engine: str = "arrow",
    allowed_sources: list[str] | None = None,
    custom: list[CustomCheck] | None = None,
) -> DataFrame:
    """Append one 0/1 flag column per row check plus ``flag_total``.

    Pure projection (no shuffle); input columns pass through untouched.

    allowed_sources: when given, the referential check rides this same
    pass as a JVM ``isin`` flag (``f_ref_source``) against the literal
    allowed set — eliminating the separate fact-table scan + anti-join
    the standalone operator costs. Correct whenever the dimension is
    small enough to collect (the broadcast side would have to fit in
    executor memory anyway); large dims use operators.referential.
    Null sources are not flagged here (completeness covers them).

    custom: extra CustomCheck constraints, appended as ``f_<name>`` (and
    ``_d_<name>`` detail) columns — JVM expressions regardless of the
    predicate engine, so arrow and native runs agree bit-for-bit. Input
    columns named ``f_*`` would collide with the flag convention that
    explode_violations auto-discovers; the suite's schema validation
    plus validate_custom_checks keep the namespace clean.
    """
    custom = validate_custom_checks(custom)
    if engine == "arrow":
        udf = _arrow_flag_udf(stats, vocab_size)
        out = df.withColumn(
            "_flags",
            udf(
                F.isnull("doc_id"),
                F.coalesce(F.size("tokens"), F.lit(-1)).cast("long"),
                F.array_min("tokens").cast("double"),
                F.array_max("tokens").cast("double"),
                F.col("n_tok").cast("double"),
            ),
        )
        for i, f in enumerate(FLAG_COLS):
            out = out.withColumn(f, F.shiftright("_flags", i).bitwiseAND(F.lit(1)))
        out = out.drop("_flags")
    elif engine == "arrow_deep":
        udf = _arrow_deep_flag_udf(stats, vocab_size)
        out = df.withColumn("_flags", udf("doc_id", "tokens", "n_tok"))
        for i, f in enumerate(FLAG_COLS):
            out = out.withColumn(f, F.shiftright("_flags", i).bitwiseAND(F.lit(1)))
        out = out.drop("_flags")
    elif engine == "native":
        out = df
        for name, col in _native_flag_cols(stats, vocab_size).items():
            out = out.withColumn(name, col)
    else:  # pragma: no cover
        raise ValueError(f"unknown engine {engine!r}")
    flag_cols = list(FLAG_COLS)
    for c in custom:
        out = out.withColumn(f"f_{c.name}", c.flag_col())
        d = c.detail_col()
        if d is not None:
            out = out.withColumn(f"_d_{c.name}", d)
        flag_cols.append(f"f_{c.name}")
    if allowed_sources is not None:
        out = out.withColumn(
            REF_FLAG,
            (
                F.col("source").isNotNull()
                & ~F.col("source").isin(*allowed_sources)
            ).cast("int"),
        )
        flag_cols.append(REF_FLAG)
    # Row-wise horizontal sum (TukeyTransformerTotal.py:25-36 analog).
    total = None
    for f in flag_cols:
        total = F.col(f) if total is None else total + F.col(f)
    return out.withColumn("flag_total", total.cast("int"))
