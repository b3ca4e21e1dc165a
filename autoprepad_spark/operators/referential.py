"""Referential-integrity check: fact.source must exist in the allowed
dimension table.

No reference counterpart (SURVEY.md §2.4 J4 — a north-rule addition).
Implemented as a broadcast hash LEFT ANTI join: the dimension side is a
few dozen rows, so every executor probes an in-memory hash map — zero
shuffle of the 10^12-row fact table. Null sources are excluded here
(completeness covers them) so a null doesn't double-report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def referential_violations(
    fact: DataFrame,
    dim: DataFrame,
    *,
    fact_key: str = "source",
    dim_key: str = "source",
    active_only: bool = True,
) -> DataFrame:
    """Rows of `fact` whose key has no match in `dim` (broadcast anti join)."""
    d = dim
    if active_only and "active" in dim.columns:
        d = d.filter(F.col("active"))
    d = d.select(F.col(dim_key).alias(fact_key)).distinct()
    return fact.filter(F.col(fact_key).isNotNull()).join(
        F.broadcast(d), on=fact_key, how="left_anti"
    )
