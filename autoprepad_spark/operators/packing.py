"""Sequence packing — binning variable-length documents into fixed-size
training context windows.

No reference counterpart (AutoPrepAD stops at per-row features); this is
the standard LLM-training-pipeline step between dedup/filtering and
example writing: short sequences are concatenated until the context
budget is full so padding waste stays low.

Spark-first shape: deterministic GREEDY-IN-ORDER packing is a running
sum — chunk_id = floor((cumsum(len) - len) / budget) over a
(group, order) window. The window partitions by the grouping column
(e.g. source), so at 10^12 rows every group's packing runs independently
after one shuffle on the group key; there is NO global sort. Documents
longer than the budget get their own chunk (and a truncation marker) —
the greedy invariant "chunk boundaries depend only on prefix sums"
keeps results identical at any parallelism.

A bin-packing variant that reorders documents (first-fit-decreasing)
packs tighter but breaks prefix-sum determinism and needs stateful
passes; greedy-in-order is what production tokenizer pipelines use for
exactly this reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def pack_sequences(
    df: DataFrame,
    *,
    budget: int,
    len_col: str = "n_tok",
    group_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Assign each row a ``chunk_id`` within its group plus its offset.

    chunk boundaries: greedy in ``order_col`` order — a row starts a new
    chunk when the running total before it has crossed a multiple of
    ``budget``. Appends:

    * ``chunk_id``   — 0-based index of the training chunk in the group
    * ``chunk_off``  — token offset of this row inside its chunk
    * ``truncated``  — 1 when the row alone exceeds ``budget``
    """
    ln = F.col(len_col).cast("long")
    w = (
        W.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = F.sum(ln).over(w)
    before = cum - ln
    return (
        df.withColumn("_before", before)
        .withColumn("chunk_id", F.floor(F.col("_before") / budget).cast("long"))
        .withColumn(
            "chunk_off", (F.col("_before") % budget).cast("long")
        )
        .withColumn("truncated", (ln > budget).cast("int"))
        .drop("_before")
    )


def chunk_tokens(
    df: DataFrame,
    *,
    length: int,
    stride: int | None = None,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    keep_partial: bool = True,
    min_len: int = 1,
) -> DataFrame:
    """Split each document's token array into fixed-``length`` training
    windows starting every ``stride`` tokens — the long-document
    counterpart of :func:`pack_sequences` (which concatenates SHORT
    docs; this splits docs LONGER than the context budget, the HF
    ``return_overflowing_tokens`` shape).

    Window starts are 0, stride, 2*stride, ... strictly below the
    document length; the tail window is clamped at the array end (so it
    may be shorter than ``length``). ``keep_partial=False`` keeps only
    full-length windows; ``min_len`` drops sub-threshold tails when
    partials are kept. Null/empty token arrays yield no rows.

    Scale shape: entirely row-local — scan -> sequence/explode ->
    project -> filter, no Exchange and no Python anywhere, so it
    parallelizes with the scan at any corpus size. The real cost is
    inherent to the op, not the plan: output bytes = input x
    (length/stride) when windows overlap; stride == length (the
    default) is write-amplification-free.

    Returns (id_col, window_id, start, tokens, n_tok) with window_id
    0-based per document and start the 0-based token offset.
    """
    if stride is None:
        stride = length
    if length <= 0 or stride <= 0:
        raise ValueError("length and stride must be positive")
    n = F.size(F.col(tokens_col))
    # ceil(n/stride) window starts fall strictly below n
    n_win = F.ceil(n / F.lit(float(stride))).cast("int")
    idx = F.when(n > 0, F.sequence(F.lit(0), n_win - 1)).otherwise(
        F.array().cast("array<int>")
    )
    win = F.slice(
        F.col(tokens_col), F.col("_i") * stride + 1, length
    ).alias("tokens")
    out = (
        df.select(id_col, tokens_col)
        .select(id_col, tokens_col, F.explode(idx).alias("_i"))
        .select(
            id_col,
            F.col("_i").cast("long").alias("window_id"),
            (F.col("_i").cast("long") * stride).alias("start"),
            win,
        )
        .withColumn("n_tok", F.size("tokens"))
    )
    if keep_partial:
        return out.filter(F.col("n_tok") >= min_len)
    return out.filter(F.col("n_tok") == length)


def chunk_stats(packed: DataFrame, *, budget: int, group_col: str = "source",
                len_col: str = "n_tok") -> DataFrame:
    """Per-group packing quality: chunks used, fill ratio, truncation count.

    One hash agg over the packed frame (no second window)."""
    ln = F.col(len_col).cast("long")
    return packed.groupBy(group_col).agg(
        (F.max("chunk_id") + 1).alias("n_chunks"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ln).alias("total_len"),
        (F.sum(ln) / ((F.max("chunk_id") + 1) * budget)).alias("fill_ratio"),
        F.sum("truncated").cast("long").alias("n_truncated"),
    )
