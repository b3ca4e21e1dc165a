"""PII detection and redaction for training-data pipelines.

The scrubbing pass every web-scale corpus needs before training (emails,
phone numbers, IP addresses, SSN-like and credit-card-like digit runs —
the CCNet/Dolma-style rule family). Everything here is a native Column
expression (``regexp_count`` / ``regexp_replace`` — whole-stage codegen,
one scan, no UDFs), so detection cost is a few extra regex passes over
text already in cache, and a DuckDB oracle can replicate every count and
redaction byte-for-byte.

Patterns deliberately stay in the RE2-compatible subset (no lookaround,
no backreferences) so Spark (java.util.regex) and the oracle engines
(RE2) accept the SAME pattern strings and agree on the match language.

No reference counterpart: AutoPrepAD's nearest string facility is the
char-class pattern encoder (CategoricalPatterns.py:46-92); PII scrubbing
is part of the training-data-pipeline extension this engine adds.

At 100 TB: embarrassingly parallel (per-row, no shuffle); `pii_report`
reduces to |groups| x |kinds| cells via one map-side-combined hash agg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Detection patterns, in REDACTION ORDER (longer/more-specific digit
#: shapes first so e.g. a credit-card run is not half-eaten by the phone
#: rule). Order is part of the contract — oracles must apply the same.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "cc": r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\+?\d{1,3}[-. ]\d{3}[-. ]\d{4}\b",
}

#: Replacement tokens, typed so downstream quality/token stats stay
#: meaningful ("[EMAIL]" is one BPE-ish token, not deleted text).
REDACTION_TOKENS: dict[str, str] = {k: f"[{k.upper()}]" for k in PII_PATTERNS}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_count(col: Column | str, kind: str) -> Column:
    """Occurrences of one PII kind in ``col`` (codegen ``regexp_count``)."""
    return F.regexp_count(_c(col), F.lit(PII_PATTERNS[kind]))


def pii_counts(col: Column | str, kinds: list[str] | None = None) -> list[Column]:
    """One aliased count column per kind: ``n_<kind>``."""
    kinds = list(PII_PATTERNS) if kinds is None else kinds
    return [pii_count(col, k).alias(f"n_{k}") for k in kinds]


def redact_pii(col: Column | str, kinds: list[str] | None = None) -> Column:
    """Replace every PII match with its typed token, applying kinds in
    PII_PATTERNS order (the order matters: rules see the text already
    redacted by earlier rules, identically in Spark and any RE2 oracle).
    """
    kinds = list(PII_PATTERNS) if kinds is None else kinds
    out = _c(col)
    for k in PII_PATTERNS:  # canonical order regardless of arg order
        if k in kinds:
            out = F.regexp_replace(out, PII_PATTERNS[k], REDACTION_TOKENS[k])
    return out


def pii_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII feature frame: one ``n_<kind>`` column per kind,
    ``n_pii`` total, and ``text_redacted``. Single scan, zero shuffles."""
    counts = pii_counts(text_col)
    total = None
    for k in PII_PATTERNS:
        t = pii_count(text_col, k)
        total = t if total is None else total + t
    return df.select(
        "*",
        *counts,
        total.alias("n_pii"),
        redact_pii(text_col).alias("text_redacted"),
    )


def pii_report(
    df: DataFrame, text_col: str = "text", group_col: str | None = None
) -> DataFrame:
    """Corpus-level PII audit: per group (or global), total hits per kind
    plus how many documents contain any PII. Output is |groups| x 1 rows
    — the shuffle carries only the aggregated cells (map-side combine),
    never documents."""
    c = _c(text_col)
    per_kind = [F.sum(pii_count(c, k)).alias(f"n_{k}") for k in PII_PATTERNS]
    any_pii = None
    for k in PII_PATTERNS:
        t = pii_count(c, k)
        any_pii = t if any_pii is None else any_pii + t
    docs_hit = F.sum((any_pii > 0).cast("long")).alias("docs_with_pii")
    n_docs = F.count(F.lit(1)).alias("n_docs")
    if group_col is None:
        return df.agg(*per_kind, docs_hit, n_docs)
    return df.groupBy(group_col).agg(*per_kind, docs_hit, n_docs)
