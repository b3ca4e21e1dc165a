"""Token-domain corpus operators: dedup + decontamination directly over
pre-tokenized sequences (``tokens: array<int>``) — no text round-trip.

The north-rule data model is a table of PRE-tokenized training sequences
(doc_id, tokens, n_tok, source); the text-side dedup/decontamination
family (``dedup.py``, ``contamination.py``) assumes a string column and
a word tokenizer. On a tokenized corpus that would mean decoding back to
text first — a pointless extra pass at 10^12 sequences. These operators
run the SAME algorithms one representation earlier: the n-gram unit is
``n`` consecutive token ids, hashed straight from the integer domain.

No reference counterpart (AutoPrepAD validates single tables,
`pipelines/control.py:40`); the algorithms are the published ones —
GPT-3 appendix-C / Llama-2 n-gram decontamination, Broder MinHash+LSH —
re-expressed over token ids.

Why integer-domain gram hashing matters at scale: gram hash =
``xxhash64`` over the n consecutive ``element_at`` ints, allocating
NOTHING per gram — no per-gram array slice, no per-gram string. The
same discipline as ``dedup.word_shingle_hashes``, where the allocating
variants were measured to cap multi-core scaling at 1.1x (strings) and
1.5x (array slices) versus 2.5x for the allocation-free form. Tokens
skip even the one-hash-per-word stage: the ids are already integers.

Collision semantics: gram equality is decided by a 64-bit xxhash64, so
two DIFFERENT grams collide with probability ~2^-64 — the same risk
class every hash-based dedup in this repo accepts (see
``contamination.py`` module docstring for the arithmetic at 10^12
shingles). Short sequences (< n tokens) contribute one whole-sequence
gram, mirroring ``word_shingle_hashes``'s short-doc fallback, so they
can only ever match an equal-length whole sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from autoprepad_spark.operators.contamination import (
    DEFAULT_MIN_OVERLAP,
    contamination_report,
)
from autoprepad_spark.operators.dedup import (
    DEFAULT_MAX_BUCKET,
    minhash_candidates,
    minhash_signatures,
    verify_pairs_jaccard,
)


def token_gram_hashes(
    tokens_col: str | F.Column, n: int = 8, *, distinct: bool = True
) -> F.Column:
    """64-bit hashes of the token n-grams of an int-array column, as
    ``array<long>`` (JVM-side, codegen, no UDF, nothing allocated per
    gram).

    gram_i = xxhash64(tokens[i], ..., tokens[i+n-1]) via ``element_at``
    longs — NOT ``xxhash64(slice(...))`` and NOT a joined string; see
    module docstring for the measured scaling difference. Sequences
    shorter than ``n`` fall back to one whole-sequence hash (same
    contract as ``dedup.word_shingle_hashes``). The input column is
    bound ONCE per row through a one-element outer ``transform`` —
    interpreted higher-order lambdas re-evaluate free expressions per
    iteration (no CSE), so a heavy upstream expression would otherwise
    run once per gram.

    ``distinct=True`` (the dedup/contamination default) emits the gram
    SET; pass False to keep one entry per position (bag semantics).
    """
    c = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col

    def body(ts: F.Column) -> F.Column:
        size = F.size(ts)
        idx = F.sequence(F.lit(1), F.greatest(size - F.lit(n - 1), F.lit(1)))
        grams = F.transform(
            idx,
            lambda i: F.xxhash64(*[F.element_at(ts, i + j) for j in range(n)]),
        )
        out = F.when(size >= n, grams).otherwise(F.array(F.xxhash64(ts)))
        return F.array_distinct(out) if distinct else out

    return F.transform(F.array(c), body)[0]


def token_gram_index(
    df: DataFrame,
    *,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """(_id, _h) inverted gram index — one row per DISTINCT token n-gram
    per sequence. Drop-in replacement for ``dedup._shingle_hashes`` so
    the minhash verify step (``verify_pairs_jaccard(shingles=...)``) and
    the incremental index builders accept token-domain grams unchanged.
    Rows are per-doc distinct by construction (``array_distinct``
    pre-explode), so downstream consumers may pass
    ``assume_distinct=True``."""
    return df.select(
        F.col(id_col).alias("_id"),
        F.explode(token_gram_hashes(tokens_col, n)).alias("_h"),
    )


def token_exact_duplicates(
    df: DataFrame,
    *,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    max_exemplars: int = 5,
) -> DataFrame:
    """Groups of IDENTICAL token sequences: (tokens_hash, dup_count,
    doc_ids) with the same bounded-exemplar contract as
    ``dedup.exact_duplicates`` (row_number window + rank-gated
    collect_list — per-group agg state bounded by K, spills instead of
    buffering, one shuffle of 16-byte keys).

    The key is md5 of the comma-joined token ids — ONE string per ROW
    (not per gram, so the per-gram-allocation scaling ceiling doesn't
    apply), chosen over xxhash64(array) because 128 bits keep the
    collision budget negligible at 10^12 sequences (64-bit birthday at
    ~4B rows) and because the exact same key is computable in plain SQL
    (``md5(array_to_string(tokens, ','))``) for oracle checking. The
    comma delimiter is unambiguous for int renderings."""
    hashed = df.select(
        F.md5(F.concat_ws(",", F.col(tokens_col))).alias("tokens_hash"),
        F.col(id_col),
    )
    w = W.partitionBy("tokens_hash").orderBy(id_col)
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .groupBy("tokens_hash")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.sort_array(
                F.collect_list(
                    F.when(F.col("_rn") <= max_exemplars, F.col(id_col))
                )
            ).alias("doc_ids"),
        )
        .filter(F.col("dup_count") > 1)
    )


def token_contamination_report(
    docs: DataFrame,
    bench: DataFrame,
    *,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    bench_tokens_col: str = "tokens",
    bench_id_col: str = "bench_id",
    n: int = 8,
    min_overlap: float = DEFAULT_MIN_OVERLAP,
    broadcast_bench: bool = True,
) -> DataFrame:
    """GPT-3/Llama-style benchmark decontamination in the token domain:
    per (sequence, benchmark item) n-gram-overlap report.

    Same output contract and plan shape as
    ``contamination.contamination_report`` — (doc_id, bench_id, n_hits,
    bench_n_shingles, overlap_frac, contaminated), output-bounded by
    TRUE overlap, benchmark gram set broadcast so the 100-TB corpus side
    is never shuffled — with the gram unit swapped to ``n`` consecutive
    token ids. Drop flagged sequences with ``contamination.decontaminate``
    (it only touches ids, so it is representation-agnostic)."""
    return contamination_report(
        docs,
        bench,
        id_col=id_col,
        bench_id_col=bench_id_col,
        min_overlap=min_overlap,
        broadcast_bench=broadcast_bench,
        doc_shingle_col=token_gram_hashes(tokens_col, n),
        bench_shingle_col=token_gram_hashes(bench_tokens_col, n),
    )


def token_repetition_profile(
    df: DataFrame,
    *,
    tokens_col: str = "tokens",
    ns: tuple[int, ...] = (2, 4, 8),
) -> DataFrame:
    """Row-local repetition/degeneracy signals over token sequences —
    the token-domain analog of ``text.repetition_profile`` (Gopher-style
    dup-n-gram fractions) plus a max-identical-token run length. All
    pure codegen/higher-order Column expressions: zero shuffle, zero
    UDF, one scan.

    Appended columns:
      * ``dup_{n}gram_frac`` for each n in ``ns`` — fraction of n-gram
        POSITIONS whose gram also occurs at another position
        (1 - distinct/total over the position bag); 0.0 for sequences
        shorter than n+1. High values flag degenerate loops — the
        classic failure shape of a broken tokenizer or a runaway
        generator.
      * ``max_token_run`` — length of the longest run of one repeated
        token id (0 for empty sequences). Catches pad-token flooding
        and single-token collapse that n-gram fractions can miss on
        short sequences.

    The run length folds once over the array with an (prev, cur_run,
    max_run) accumulator via ``F.aggregate`` — O(len) per row, no
    per-element allocation beyond the struct."""
    c = F.col(tokens_col)
    out = df
    for n in ns:
        grams = token_gram_hashes(tokens_col, n, distinct=False)

        def frac(g: F.Column) -> F.Column:
            total = F.size(g)
            return F.when(
                total > 1,
                F.lit(1.0) - F.size(F.array_distinct(g)) / total.cast("double"),
            ).otherwise(F.lit(0.0))

        # bind the gram array once (no-CSE rule, see token_gram_hashes)
        out = out.withColumn(
            f"dup_{n}gram_frac",
            F.transform(F.array(grams), frac)[0],
        )
    run = F.aggregate(
        c,
        F.struct(
            F.lit(None).cast("int").alias("prev"),
            F.lit(0).alias("cur"),
            F.lit(0).alias("best"),
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(acc["prev"].isNotNull() & (t == acc["prev"]), acc["cur"] + 1)
            .otherwise(F.lit(1))
            .alias("cur"),
            F.greatest(
                acc["best"],
                F.when(
                    acc["prev"].isNotNull() & (t == acc["prev"]), acc["cur"] + 1
                ).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return out.withColumn(
        "max_token_run", F.coalesce(run, F.lit(0))
    )


def token_minhash_pairs(
    df: DataFrame,
    *,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    n: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
    threshold: float = 0.8,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
    grams: DataFrame | None = None,
    broadcast_pairs: bool = False,
    prune_index: bool = True,
) -> DataFrame:
    """Near-duplicate sequence pairs (id_a, id_b, jaccard) with exact
    token-n-gram Jaccard >= ``threshold``, found via MinHash LSH.

    The canonical three-stage shape, entirely reused from ``dedup`` with
    the gram unit swapped to token ids: signatures (one codegen explode
    + map-side-combined agg — the plan shape that won dedup's measured
    3-way A/B at both core counts) -> LSH banding candidates
    (bucket-keyed shuffle, quadratic-blowup cap) -> exact verification
    over the token-gram index. Deterministic at any parallelism (seeded
    xxhash64 throughout, no RNG).

    LAZY like its text twin: this returns a plan. ``grams`` lets the
    caller share ONE materialized ``token_gram_index`` frame across the
    signature agg and the verify joins (and is what the caller should
    ``.cache()``; the signature frame feeds both sides of the LSH
    self-join, so cache that too when running eagerly — see
    ``__spark_entry__.q_token_minhash_dedup`` for the ownership
    pattern). LSH recall below J ~= (1/bands)^(1/rows_per_band) decays
    smoothly; 32 hashes / 8 bands put the S-curve midpoint at J ~= 0.77.
    """
    if grams is None:
        grams = token_gram_index(df, tokens_col=tokens_col, id_col=id_col, n=n)
    sigs = minhash_signatures(
        df, id_col=id_col, num_hashes=num_hashes, seed=seed, shingles=grams
    )
    cand = minhash_candidates(
        sigs, id_col=id_col, bands=bands, num_hashes=num_hashes,
        max_bucket_size=max_bucket_size,
    )
    return verify_pairs_jaccard(
        df, cand, id_col=id_col, threshold=threshold,
        shingles=grams, assume_distinct=True,
        broadcast_pairs=broadcast_pairs, prune_index=prune_index,
    )
