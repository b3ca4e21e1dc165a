"""As-of (backward) join — attach the most recent right-side row at or
before each left row's timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/pandas do); the naive
range-condition join degenerates to a per-key cross product. The
Spark-first formulation is the union-tag trick: union both sides with a
side marker, then one window pass per key carries the latest right
value forward —

    last(right_value, ignorenulls=True)
      OVER (PARTITION BY key ORDER BY ts, side ROWS UNBOUNDED PRECEDING)

Right rows sort before left rows at equal timestamps, so a right row
with ts == left.ts IS visible (the standard >= asof semantics). Cost:
ONE shuffle on the key + a per-key sort — no join, no row explosion,
and the window is partitioned (never a global sort). Deterministic for
any parallelism: ties beyond (ts, side) are broken by a caller-supplied
tiebreak column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    ts_col: str = "ts",
    value_cols: list[str],
    tiebreak: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left rows + ``<value>_asof`` columns = the matching right row's
    values (null when no right row at or before the left timestamp).

    right is projected to (on, ts_col, value_cols) — pass pre-filtered/
    pre-deduplicated sides; if multiple right rows share (key, ts), the
    one last in (ts, tiebreak) order wins.
    """
    out_names = [f"{v}{suffix}" for v in value_cols]
    clash = set(out_names) & set(left.columns)
    if clash:
        raise ValueError(f"output columns already exist on left: {sorted(clash)}")

    r = right.select(
        F.col(on),
        F.col(ts_col),
        *[F.col(v).alias(n) for v, n in zip(value_cols, out_names)],
    ).withColumn("_side", F.lit(0))
    l = left.withColumn("_side", F.lit(1))
    for n in out_names:
        l = l.withColumn(n, F.lit(None).cast(r.schema[n].dataType))
    for c in l.columns:
        if c not in r.columns:
            r = r.withColumn(
                c, F.lit(None).cast(l.schema[c].dataType)
            )
    unioned = l.unionByName(r.select(*l.columns))

    order = [F.col(ts_col), F.col("_side")]
    if tiebreak is not None:
        order.append(F.col(tiebreak))
    w = (
        W.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    for n in out_names:
        unioned = unioned.withColumn(n, F.last(n, ignorenulls=True).over(w))
    return unioned.filter(F.col("_side") == 1).drop("_side")


def sessionize(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak: str | None = None,
) -> DataFrame:
    """Gap-based sessionization: rows more than ``gap_seconds`` apart
    start a new session per key. Appends ``session_idx`` (0-based per
    key, in time order).

    The batch formulation of what Structured Streaming calls session
    windows: new_session = (ts - lag(ts) > gap), session_idx =
    running sum — two expressions over ONE partitioned window (a single
    key shuffle, per-key sort, no self-join). ``tiebreak`` makes
    equal-timestamp ordering deterministic at any parallelism.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = W.partitionBy(key_col).orderBy(*order)
    # epoch seconds via unix_timestamp (TIMESTAMP_NTZ has no direct long
    # cast; the ntz->ltz cast is exact under the engine's fixed UTC zone)
    sec = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    prev = F.lag(sec).over(w)
    new_sess = (
        prev.isNull() | (sec - prev > gap_seconds)
    ).cast("long")
    run = W.partitionBy(key_col).orderBy(*order).rowsBetween(
        W.unboundedPreceding, 0
    )
    return df.withColumn("session_idx", (F.sum(new_sess).over(run) - 1).cast("long"))
