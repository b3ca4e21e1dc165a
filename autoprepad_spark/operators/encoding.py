"""Encoding repair: detect and fix UTF-8-as-latin1/cp1252 mojibake.

Web crawls are full of double-encoded text ("Ã©" where "é" was meant,
"â€œ" for a curly quote) — the ftfy problem. This is the stdlib-only
subset that covers the dominant failure mode: UTF-8 bytes decoded as
cp1252/latin-1 (possibly more than once). No reference counterpart;
part of the beyond-reference corpus-cleaning surface alongside the C4 /
Gopher gates.

Plan shape (the usual two-tier split of this engine):

- **detect** (`mojibake_score`) is a pure codegen expression —
  ``regexp_count`` of the artifact classes (Ã/Â/â€/å sequences) per
  char. Usable as a quality signal or a filter on its own; costs one
  regex pass, JVM-side.
- **repair** (`fix_encoding`) gates Python per ROW, not per job: the
  Arrow UDF receives ``when(suspect, text)`` — NULL for the clean rows
  — so although the ArrowEvalPython node sees every row, clean rows
  cost a null check, not a repair attempt, and the repaired column is
  ``coalesce(fixed, original)``. On a mostly-clean corpus the Python
  work is proportional to the mojibake rate. Repair itself is the
  classic round-trip: re-encode cp1252 (latin-1 fallback for the five
  cp1252 holes), re-decode UTF-8, repeat up to ``max_passes`` while it
  keeps succeeding AND keeps removing artifacts; any failure keeps the
  input (never destructive).

`repair_text` is the driver-side reference the UDF and the pytest
oracle share (same pattern as tokenizer.encode_word).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

#: what UTF-8 continuation bytes (0x80-0xBF) look like after a cp1252
#: or latin-1 misdecode: the latin-1 block plus cp1252's remappings of
#: 0x80-0x9F (curly quotes, dashes, euro, ...).
_CONT = (
    # C1 controls + latin-1 block: latin-1 misdecode lands 0x80-0xBF here
    "\u0080-\u00bf"
    # cp1252 remappings of 0x80-0x9F (curly quotes, dashes, euro, ...)
    "\u20ac\u201a\u0192\u201e\u2026\u2020\u2021\u02c6\u2030"
    "\u0160\u2039\u0152\u017d\u2018\u2019\u201c\u201d\u2022"
    "\u2013\u2014\u02dc\u2122\u0161\u203a\u0153\u017e\u0178"
)

#: what UTF-8 lead bytes (0xC2-0xEF) look like after the same misdecode.
_LEAD = "\u00c2-\u00d6\u00d8-\u00df\u00e0-\u00ef\u00f0-\u00f4"

#: a misdecoded multi-byte sequence: lead-looking char followed by a
#: continuation-looking char. One pattern string shared by Java regex
#: (Spark codegen) and Python re (the driver-side reference).
MOJIBAKE_RE = f"[{_LEAD}][{_CONT}]"


def mojibake_score(col: Column | str) -> Column:
    """Artifacts per character (0.0 for clean/empty) — a codegen
    quality signal; threshold it like any other gate."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(c).isNull() | (F.length(c) == 0), F.lit(0.0)).otherwise(
        F.regexp_count(c, F.lit(MOJIBAKE_RE)) / F.length(c)
    )


def _artifact_count(s: str) -> int:
    import re

    return len(re.findall(MOJIBAKE_RE, s))


def repair_text(s: str, max_passes: int = 3) -> str:
    """Driver-side reference repair: undo up to ``max_passes`` rounds of
    UTF-8-read-as-cp1252, keeping the input whenever a round-trip fails
    or stops removing artifacts. Never raises; never lossy."""
    cur = s
    for _ in range(max_passes):
        before = _artifact_count(cur)
        if before == 0:
            break
        try:
            raw = cur.encode("cp1252")
        except UnicodeEncodeError:
            try:
                raw = cur.encode("latin-1")
            except UnicodeEncodeError:
                break
        try:
            cand = raw.decode("utf-8")
        except UnicodeDecodeError:
            break
        if _artifact_count(cand) >= before:
            break
        cur = cand
    return cur


def fix_encoding(
    df: DataFrame,
    text_col: str = "text",
    *,
    out_col: str | None = None,
    flag_col: str = "was_mojibake",
    max_passes: int = 3,
) -> DataFrame:
    """Repaired text (in place by default) + a boolean flag column.
    Row-local: no shuffle, no join; Python work only on suspect rows
    (see module docstring)."""
    out_col = out_col or text_col
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _repair(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [None if t is None else repair_text(t, max_passes) for t in texts],
            dtype="object",
        )

    c = F.col(text_col)
    suspect = F.regexp_like(c, F.lit(MOJIBAKE_RE))
    tmp = "__fixed__"
    # one UDF invocation: materialize into a temp column, then derive
    # the flag and the output from it (no double ArrowEvalPython)
    return (
        df.withColumn(tmp, F.coalesce(_repair(F.when(suspect, c)), c))
        .withColumn(
            flag_col, F.coalesce(F.col(tmp) != c, F.lit(False))
        )
        .withColumn(out_col, F.col(tmp))
        .drop(tmp)
    )
