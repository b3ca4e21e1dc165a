"""Deterministic sampling / data mixing — hash-split selection for
training-data pipelines.

No reference counterpart (AutoPrepAD's experiment harness slices frames
positionally, /root/reference/pipelines/experiment/experiment.py:120-178
— meaningless on an unordered distributed table). ``DataFrame.sample``/
``sampleBy`` seed per-partition RNGs, so their selection CHANGES with
partitioning — unusable where the north rule demands identical outputs
at any parallelism. Here membership is a pure function of the row key:

    keep row <=> md5(key || salt) < hex_threshold(fraction)

md5 emits lowercase hex, so a lexicographic string compare against an
8-hex-digit threshold IS the numeric compare of the top 32 hash bits —
no integer parsing, identical semantics in any engine with md5()
(which is what makes these operators DuckDB-oracle-checkable). Sampling
is a filter: it pushes into the scan, shuffles nothing, and composes
with partition pruning. Distinct ``salt`` values give independent
samples (train/val/test splits that never overlap draws).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_HASH_SPACE = 16 ** 8  # top 8 hex digits of md5 = 32 bits


def hash_threshold(fraction: float) -> str:
    """8-hex-digit threshold with P(md5-prefix < threshold) = fraction.

    fraction >= 1.0 returns "g": every md5 digest starts with [0-9a-f],
    all of which sort before "g", so ``digest < "g"`` is always true —
    coverage is EXACT (clamping to "ffffffff" instead would orphan the
    ~2^-32 of rows whose digest prefix is exactly ffffffff, breaking
    hash_split's every-row-lands-in-exactly-one-split guarantee)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    if fraction >= 1.0:
        return "g"
    return format(int(fraction * _HASH_SPACE), "08x")


def _bucket(key_col: str, salt: str) -> Column:
    k = F.col(key_col).cast("string")
    if salt:
        k = F.concat(k, F.lit(salt))
    return F.md5(k)


def deterministic_sample(
    df: DataFrame, fraction: float, *, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep ~fraction of rows, selected by key hash — reproducible at any
    parallelism, on any engine, across reruns."""
    return df.filter(_bucket(key_col, salt) < F.lit(hash_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    *,
    group_col: str = "source",
    key_col: str = "doc_id",
    default: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-group sampling rates (the training-mix reweighting step: e.g.
    downsample web, keep books). One filter expression — a when-chain
    over the (small) group->threshold map; no shuffle, no UDF."""
    thr = F.lit(hash_threshold(default))
    for g, frac in sorted(fractions.items()):
        thr = F.when(F.col(group_col) == g, F.lit(hash_threshold(frac))).otherwise(thr)
    return df.filter(_bucket(key_col, salt) < thr)


def hash_split(
    df: DataFrame,
    fractions: list[float],
    *,
    key_col: str = "doc_id",
    salt: str = "split",
) -> list[DataFrame]:
    """Disjoint covering splits (train/val/test) by consecutive hash
    ranges; every row lands in exactly one split, independent of
    partitioning. fractions must sum to <= 1 (remainder goes nowhere)."""
    if sum(fractions) > 1.0 + 1e-9:
        raise ValueError("fractions sum to more than 1")
    out = []
    lo = 0.0
    for frac in fractions:
        hi = lo + frac
        # float accumulation of fractions summing to 1 can land at
        # 1 - 1e-16; snap to 1.0 so the final split's upper bound is the
        # always-true "g" threshold and coverage is exact
        if hi >= 1.0 - 1e-9:
            hi = 1.0
        b = _bucket(key_col, salt)
        cond = b < F.lit(hash_threshold(hi))
        if lo > 0:
            cond = cond & (b >= F.lit(hash_threshold(lo)))
        out.append(df.filter(cond))
        lo = hi
    return out
