"""Incremental (shard-vs-history) deduplication.

The production shape of dedup at 100 TB is NOT one giant self-join:
corpora grow by shards (a daily crawl, a new dump), and each shard must
dedup against everything already accepted WITHOUT re-reading, let alone
re-shingling, the historical corpus. The standard answer (CCNet's
hashed-shard join, Dolma's bloom pass, SlimPajama/BigCode's MinHash
index) is a persisted per-doc SKETCH index:

    index row = (doc_id, content_hash, sig)
      content_hash : xxhash64 of normalized text  -> exact dups
      sig          : the num_hashes MinHash values -> near dups

Everything derives from the index at query time: LSH band buckets are a
pure expression over ``sig`` (the SAME banding as minhash_candidates,
so an index built today keeps working as shards arrive), and near-dup
verification uses the signature-estimated Jaccard (matching-component
fraction — the textbook unbiased estimator, E[est] = J, sd ~=
sqrt(J(1-J)/num_hashes)), so the historical TEXT is never touched.

At 100 TB: the index is ~(8 + 8 + 8*num_hashes) bytes/doc (~280 B at 32
hashes — 28 TB per 100 B docs, vs re-shingling 100 TB of text per
shard); the exact pass is one hash anti-join on 8-byte keys; the band
join is an equi-join on (band, bucket) with the same oversized-bucket
cap as minhash_candidates; signatures join back only for docs that
appear in some candidate pair (the verify_pairs_jaccard prune argument
applies identically). The shard, not the history, is the driving side
of every join.

Reference parity: AutoPrepAD has no incremental facility (its nearest
notion is fit-once/predict-many, AutoPrepAD.py fit/predict); this is
part of the training-data-pipeline extension, alongside dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from autoprepad_spark.operators.dedup import (
    DEFAULT_MAX_BUCKET,
    minhash_signatures,
    normalize_text,
)

#: index column names — the stable on-disk contract
INDEX_COLS = ("doc_id", "content_hash", "sig")


def content_hash(text_col: str = "text") -> Column:
    """64-bit hash of normalized text — the exact-dup key (normalization
    mirrors exact_duplicates: same text modulo case/whitespace collapses
    to the same key)."""
    return F.xxhash64(normalize_text(text_col))


def build_dedup_index(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    num_hashes: int = 32,
    seed: int = 42,
) -> DataFrame:
    """(doc_id, content_hash, sig) — one row per doc, ready to persist.

    One pass over the corpus: the shingle explode feeding the minhash
    aggregation is the only heavy stage, and it happens ONCE per doc
    ever — every future shard joins against this frame instead.

    Storage layout at scale: BUCKET the persisted index BY
    ``content_hash`` (e.g. ``.write.bucketBy(n, "content_hash")``) —
    the exact pass is an equi-join on that column, so a bucketed
    history side joins shuffle-free (storage-partitioned join); only
    the small shard side is exchanged. The near-dup band join keys on
    derived (band, bucket) columns, so it always exchanges — but only
    |history| * bands rows of three longs, never text or signatures.

    Null-text docs: ``normalize_text(NULL)`` is NULL, so a null-text
    doc contributes no shingles and no signature (same as the batch
    operators in dedup.py); its content_hash degenerates to the
    constant xxhash64 seed, making all null-text docs mutual exact
    duplicates. Filter nulls out (the validation suite's null checks
    exist for this) before indexing.
    """
    sigs = minhash_signatures(
        docs,
        text_col=text_col,
        id_col=id_col,
        k_shingle=k_shingle,
        num_hashes=num_hashes,
        seed=seed,
    )
    hashes = docs.select(
        F.col(id_col).alias("doc_id"), content_hash(text_col).alias("content_hash")
    )
    # join (not a wide recompute): sigs already shuffled by id; the
    # hash side is narrow (id, 8B) and co-keyed
    return hashes.join(sigs.withColumnRenamed(id_col, "doc_id"), "doc_id")


def _band_buckets(
    sigs: DataFrame, id_col: str, bands: int, num_hashes: int
) -> DataFrame:
    """(_id, band, bucket) — the SAME bucket function as
    minhash_candidates (band-seeded xxhash64 over the band's signature
    longs), factored over a (id, sig) frame."""
    rows_per_band = num_hashes // bands
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.lit(b),
                    *[
                        F.element_at("sig", b * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ],
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    return sigs.select(
        F.col(id_col).alias("_id"), F.explode(band_cols).alias("bb")
    ).select("_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def estimated_jaccard(sig_a: Column, sig_b: Column) -> Column:
    """Matching-component fraction of two MinHash signatures — the
    unbiased Jaccard estimator (Broder 1997)."""
    matches = F.aggregate(
        F.zip_with(sig_a, sig_b, lambda a, b: (a == b).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return matches / F.size(sig_a).cast("double")


def dedup_against_index(
    new_docs: DataFrame,
    index: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    num_hashes: int = 32,
    seed: int = 42,
    bands: int = 8,
    threshold: float = 0.8,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
) -> tuple[DataFrame, DataFrame]:
    """Dedup a new shard against the historical index.

    Returns ``(kept, dropped)``:
      kept    — new_docs rows surviving both passes, plus their
                ``content_hash``/``sig`` columns (exactly the
                build_dedup_index schema + the shard's payload), so
                appending the kept rows' INDEX_COLS to the index is the
                whole index update — no recompute.
      dropped — (doc_id, reason, matched_id, est_jaccard) audit:
                reason 'exact' (content_hash already indexed,
                matched_id/est null — the hash join never sees which
                historical doc, by design: that would widen the join)
                or 'near' (some candidate's estimated Jaccard >=
                threshold; matched_id = the historical doc realizing
                the max estimate).

    Pass ordering matters: exact drops happen FIRST, so near-dup work
    (shingling, banding, the candidate join) runs only on content the
    corpus has genuinely never seen. k_shingle/num_hashes/seed/bands
    must match the values the index was built with (they define the
    hash family; the defaults are build_dedup_index's).

    Intra-shard duplicates are NOT handled here — run the batch
    pipeline (exact_duplicates / minhash_candidates) within the shard
    first; this operator's contract is shard-vs-history only. The
    kept/dropped partition guarantee requires non-null text (a
    null-text doc has no signature and would drop out of ``kept``'s
    signature join — see build_dedup_index's null note).
    """
    new_hashed = new_docs.withColumn("content_hash", content_hash(text_col))
    # no distinct: semi/anti join semantics ignore build-side duplicates,
    # and a distinct here would be a full shuffle of the history
    idx_hashes = index.select("content_hash")
    exact_dropped = (
        new_hashed.join(idx_hashes, "content_hash", "left_semi")
        .select(
            F.col(id_col).alias("doc_id"),
            F.lit("exact").alias("reason"),
            F.lit(None).cast("long").alias("matched_id"),
            F.lit(None).cast("double").alias("est_jaccard"),
        )
    )
    fresh = new_hashed.join(idx_hashes, "content_hash", "left_anti")

    sigs_new = minhash_signatures(
        fresh,
        text_col=text_col,
        id_col=id_col,
        k_shingle=k_shingle,
        num_hashes=num_hashes,
        seed=seed,
    )
    b_new = _band_buckets(sigs_new, id_col, bands, num_hashes)
    b_idx = _band_buckets(
        index.select(F.col("doc_id"), F.col("sig")), "doc_id", bands, num_hashes
    )
    if max_bucket_size is not None:
        # cap on the HISTORY side: an oversized historical bucket is a
        # boilerplate cluster; any shard doc landing in it meets the cap
        # count long before it meets every member (same rationale as
        # minhash_candidates). Aggregated counts, no window over history.
        bucket_n = b_idx.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("_bn")
        )
        b_idx = (
            b_idx.join(bucket_n, ["band", "bucket"])
            .filter(F.col("_bn") <= max_bucket_size)
            .drop("_bn")
        )
    cand = (
        b_new.join(b_idx.withColumnRenamed("_id", "_old"), ["band", "bucket"])
        .select(F.col("_id").alias("new_id"), F.col("_old").alias("old_id"))
        .distinct()
    )
    # signatures join back only for pair participants (both sides are
    # candidate-pruned — the verify_pairs_jaccard argument)
    s_new = sigs_new.select(
        F.col(id_col).alias("new_id"), F.col("sig").alias("sig_new")
    ).join(cand.select("new_id").distinct(), "new_id", "left_semi")
    s_old = index.select(
        F.col("doc_id").alias("old_id"), F.col("sig").alias("sig_old")
    ).join(cand.select("old_id").distinct(), "old_id", "left_semi")
    scored = (
        cand.join(s_new, "new_id")
        .join(s_old, "old_id")
        .withColumn("est_jaccard", estimated_jaccard("sig_new", "sig_old"))
        .filter(F.col("est_jaccard") >= threshold)
    )
    near_dropped = (
        scored.groupBy("new_id")
        .agg(
            F.max(F.struct("est_jaccard", F.col("old_id"))).alias("m"),
        )
        .select(
            F.col("new_id").alias("doc_id"),
            F.lit("near").alias("reason"),
            F.col("m.old_id").alias("matched_id"),
            F.round(F.col("m.est_jaccard"), 9).alias("est_jaccard"),
        )
    )
    dropped = exact_dropped.unionByName(near_dropped)
    kept = fresh.join(
        near_dropped.select(F.col("doc_id").alias(id_col)), id_col, "left_anti"
    ).join(sigs_new, id_col)
    return kept, dropped


def append_to_index(
    index: DataFrame, kept: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """The updated index after accepting a shard: union of the old index
    and the kept rows' index columns (already computed by
    dedup_against_index — zero recompute)."""
    return index.select(*INDEX_COLS).unionByName(
        kept.select(
            F.col(id_col).alias("doc_id"), F.col("content_hash"), F.col("sig")
        )
    )
