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
    # Null keys hash to a fixed sentinel rather than NULL: md5(NULL) is
    # NULL, which fails every comparison — null-key rows would silently
    # vanish from ALL splits, breaking hash_split's every-row-lands-in-
    # exactly-one-split guarantee (real corpora do contain null ids;
    # datagen injects them). All null-key rows co-locate deterministically.
    k = F.coalesce(F.col(key_col).cast("string"), F.lit("\x00null"))
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


def mix_rates(
    df: DataFrame,
    targets: dict[str, float],
    *,
    weight_col: str = "n_tok",
    group_col: str = "source",
) -> dict[str, float]:
    """Per-group sampling rates realizing a target WEIGHT mixture.

    The training-mix step of an LLM pipeline weights sources by TOKENS,
    not documents (e.g. 60% web / 30% code / 10% books of the token
    budget). Given available token mass per group (ONE |groups|-row
    aggregation — the only action here), pick rates that hit the target
    proportions while keeping as much data as possible: the binding
    group (smallest available/target ratio) keeps rate 1.0 and every
    other group is downsampled to match. Groups absent from ``targets``
    get no rate (callers drop them via stratified_sample's default=0).
    """
    avail = _group_mass(df, weight_col, group_col)
    return _rates_from_avail(avail, targets)


def _group_mass(df: DataFrame, weight_col: str, group_col: str) -> dict[str, float]:
    """Available weight per group — ONE |groups|-row aggregation."""
    return {
        r[group_col]: float(r["_w"])
        for r in df.groupBy(group_col).agg(F.sum(weight_col).alias("_w")).collect()
        if r["_w"] is not None and r["_w"] > 0
    }


def _rates_from_avail(
    avail: dict[str, float], targets: dict[str, float]
) -> dict[str, float]:
    t = {g: v for g, v in targets.items() if g in avail and v > 0}
    z = sum(t.values())
    if not t or z <= 0:
        raise ValueError(
            f"no overlap between targets {sorted(targets)} and groups "
            f"present {sorted(avail)}"
        )
    t = {g: v / z for g, v in t.items()}
    scale = min(avail[g] / t[g] for g in t)  # binding group -> rate 1.0
    return {g: (scale * t[g]) / avail[g] for g in t}


def temperature_mix_rates(
    df: DataFrame,
    alpha: float,
    *,
    weight_col: str = "n_tok",
    group_col: str = "source",
) -> dict[str, float]:
    """Per-group rates realizing a TEMPERATURE-flattened mixture:
    target share of group g is mass_g^alpha / sum_h mass_h^alpha — the
    standard multilingual/multi-source sampling temperature (mBERT /
    XLM-R style, alpha typically 0.3-0.7; alpha=1 keeps the natural
    mix, alpha=0 is uniform over groups, alpha<1 boosts low-resource
    groups relative to their mass).

    Realized WITHOUT replication: temperature flattening means rich
    groups are downsampled toward the flattened shares while the
    binding group — for alpha<1 always a smallest-mass group, since
    avail/target grows with mass^(1-alpha) — keeps rate 1.0 and loses
    nothing. Costs the same single |groups|-row aggregation as
    mix_rates; feed the result to stratified_sample (or use
    mix_by_tokens with these rates' targets) for the pushed-down
    deterministic membership filter."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    avail = _group_mass(df, weight_col, group_col)
    targets = {g: m**alpha for g, m in avail.items()}
    return _rates_from_avail(avail, targets)


def mix_by_tokens(
    df: DataFrame,
    targets: dict[str, float],
    *,
    weight_col: str = "n_tok",
    group_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic token-weighted source mixing: ``mix_rates`` then
    ``stratified_sample``. Per-doc hash selection is unbiased in tokens
    (selection is independent of the weight), so the realized token mix
    matches the target in expectation with relative error shrinking as
    1/sqrt(docs-per-group); membership stays a pushed-down filter that
    is reproducible at any parallelism. Groups not in ``targets`` are
    dropped (rate 0)."""
    rates = mix_rates(df, targets, weight_col=weight_col, group_col=group_col)
    return stratified_sample(
        df, rates, group_col=group_col, key_col=key_col, default=0.0, salt=salt
    )


def hash_fraction(key_col: str, salt: str) -> Column:
    """The key's hash as a double in [0, 1) — the deterministic uniform
    draw behind per-row Bernoulli selection (top 32 md5 bits / 2^32,
    numeric because the acceptance threshold is per-ROW here, unlike
    the constant-threshold string compare the fixed-rate samplers use).
    """
    return F.conv(F.substring(_bucket(key_col, salt), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(float(_HASH_SPACE))


def weighted_sample(
    df: DataFrame,
    *,
    weight_col: str,
    target_fraction: float | None = None,
    key_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Quality-weighted soft filtering: keep each row with probability
    proportional to its score (the DCLM-style alternative to a hard
    classifier cutoff — hard thresholds collapse diversity at the
    boundary; scaling keep-probability by quality keeps a graded mix).

    The draw is ``hash_fraction(key)`` — a pure function of the row key,
    so selection is reproducible at any parallelism and independent of
    the weight (no bias from correlated draws). Null or negative
    weights drop the row; weights above 1 (after scaling) saturate.

    ``target_fraction`` scales weights so the EXPECTED kept row
    fraction hits the target: one |1|-row aggregation computes
    c = target * n / sum(w) and the filter keeps rows with
    draw < min(1, c*w). Exact in expectation when no weight saturates;
    when scaling pushes some weights past 1 the realized rate falls
    short by the clamped mass (documented bias — iterate c if you need
    the exact rate under saturation). Without it, ``weight_col`` is
    used directly as a [0,1] probability.

    The filter is a scan-level predicate: no shuffle, no UDF, composes
    with partition pruning at any corpus size.
    """
    w = F.col(weight_col).cast("double")
    if target_fraction is not None:
        if not 0.0 <= target_fraction <= 1.0:
            raise ValueError(
                f"target_fraction must be in [0,1], got {target_fraction}"
            )
        stats = df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(w > 0, w).otherwise(F.lit(0.0))).alias("sw"),
        ).collect()[0]
        if not stats["sw"]:
            return df.filter(F.lit(False))
        c = target_fraction * float(stats["n"]) / float(stats["sw"])
        w = w * F.lit(c)
    p = F.least(F.greatest(w, F.lit(0.0)), F.lit(1.0))
    return df.filter(
        w.isNotNull() & (hash_fraction(key_col, salt) < p)
    )


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
