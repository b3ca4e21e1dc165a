"""Corpus-cleaning pipeline plan: the LLM-training-data stages composed
into ONE auditable pass.

No reference counterpart (AutoPrepAD stops at tabular validation); this
is the composition layer over the operators the round briefs ask for —
a user points it at a documents table and gets back (clean corpus,
per-stage audit) without hand-wiring the joins.

Design for 10^12 rows: every filter stage is expressed as a TAG, not an
eager filter — the corpus is scanned once, drop reasons become one
``drop_stage`` column (first failing stage wins, fixed priority), the
audit is ONE tiny groupBy over that column, and the clean corpus is the
``drop_stage IS NULL`` slice of the same cached plan. Stages that need
their own shuffle (exact-dup canonical pick, near-dup clustering,
semantic dedup, decontamination) each reduce to a *drop-list of doc
ids* that is tiny relative to the corpus and joins back on the id key
(broadcast-or-AQE); the corpus itself is shuffled at most once (the
exact-dedup hash join) and never widened.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from autoprepad_spark.operators.contamination import contamination_report
from autoprepad_spark.operators.dedup import connected_components, normalize_text
from autoprepad_spark.operators.text import (
    C4_DEFAULT_BADWORDS,
    c4_clean_lines,
    dup_ngram_char_fraction,
    duplicate_line_fraction,
    gopher_signals,
    top_ngram_fraction,
)

#: stage names in drop priority order (earlier wins the tag)
STAGES = (
    "exact_dup",
    "near_dup",
    "semantic_dup",
    "contaminated",
    "c4",
    "gopher",
    "repetition",
    "quality",
)


def clean_corpus(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    fix_mojibake: bool = False,
    exact_dedup: bool = True,
    near_dup_pairs: DataFrame | None = None,
    semantic_keep: DataFrame | None = None,
    benchmark: DataFrame | None = None,
    contamination_k: int = 5,
    contamination_min_overlap: float = 0.5,
    c4: bool = False,
    c4_min_words: int = 3,
    c4_min_sentences: int = 5,
    c4_badwords: tuple[str, ...] = C4_DEFAULT_BADWORDS,
    gopher: bool = False,
    max_dup_line_frac: float | None = None,
    max_top_bigram_frac: float | None = None,
    max_dup_5gram_char_frac: float | None = None,
    min_chars: int | None = None,
    max_chars: int | None = None,
    max_punct_ratio: float | None = None,
    lm_model: dict | None = None,
    max_ppl: float | None = None,
    lm_backoff: float = 0.1,
) -> tuple[DataFrame, DataFrame]:
    """Compose the cleaning stages; returns ``(clean, audit)``.

    clean: the surviving documents, original schema (when ``c4`` is on,
    ``text_col`` is replaced by its line-cleaned form — C4's semantics).
    audit: one row per stage — (stage, dropped) — plus ("kept", n).

    * ``fix_mojibake`` — encoding repair FIRST (operators/encoding.py),
      so dedup and every gate see the repaired text (two mojibake
      copies of one page dedup against its clean copy). Row-local; the
      Python repair runs only on regex-suspect rows, but note the
      drop-list subtrees re-scan the corpus, so at very large scale
      repair-and-persist upstream instead of toggling it here.
    * ``exact_dedup`` — byte-identical (normalized) texts keep only the
      smallest id (one 16-byte-hash shuffle of (id, hash) pairs).
    * ``near_dup_pairs`` — verified near-dup pairs (id_a, id_b), e.g.
      from minhash_candidates → verify_pairs_jaccard; clusters resolve
      via connected components and every non-canonical member drops.
    * ``semantic_keep`` — the output of similarity.semantic_duplicates
      (SemDeDup): rows with keep=false drop. Passed in rather than
      computed here because it runs over the EMBEDDINGS table, which is
      a different input than the documents table.
    * ``benchmark`` — eval excerpts (bench_id, text); documents whose
      k-gram overlap exceeds ``contamination_min_overlap`` drop
      (GPT-3-style decontamination).
    * ``c4`` — Raffel et al. 2020 line + page rules (text.c4_page_filter
      semantics inlined so no second scan is needed).
    * ``gopher`` — the Rae et al. 2021 Table-A1 document-quality gate
      (text.gopher_signals with the paper's thresholds).
    * repetition gates — Gopher signals (text.repetition_profile
      columns), each enabled by passing its threshold.
    * quality gates — length bounds + punctuation-ratio bound.
    * ``lm_model`` + ``max_ppl`` — CCNet-style perplexity gate under a
      fitted lm_quality.fit_bigram_lm model: docs whose perplexity
      exceeds ``max_ppl`` (or is NULL — empty text) drop. Row-local
      like the other expression stages: the model rides along as
      constant-folded map literals, no join, no extra scan.
    """
    if fix_mojibake:
        from autoprepad_spark.operators.encoding import fix_encoding

        docs = fix_encoding(
            docs, text_col, flag_col="_was_mojibake"
        ).drop("_was_mojibake")

    tagged = docs

    # ---- drop-lists (tiny frames keyed by doc id) --------------------
    if exact_dedup:
        keys = docs.select(
            F.col(id_col), F.md5(normalize_text(text_col)).alias("_h")
        )
        keep = keys.groupBy("_h").agg(F.min(id_col).alias("_keep_id"))
        dup_ids = (
            keys.join(keep, "_h")
            .filter(F.col(id_col) != F.col("_keep_id"))
            .select(id_col, F.lit(True).alias("_exact_dup"))
        )
        tagged = tagged.join(dup_ids, id_col, "left")
    else:
        tagged = tagged.withColumn("_exact_dup", F.lit(None).cast("boolean"))

    if near_dup_pairs is not None:
        labels = connected_components(near_dup_pairs)
        near_ids = (
            labels.filter(F.col("node") != F.col("component"))
            .select(F.col("node").alias(id_col), F.lit(True).alias("_near_dup"))
        )
        tagged = tagged.join(near_ids, id_col, "left")
    else:
        tagged = tagged.withColumn("_near_dup", F.lit(None).cast("boolean"))

    if semantic_keep is not None:
        sem_ids = (
            semantic_keep.filter(~F.col("keep"))
            .select(F.col(semantic_keep.columns[0]).alias(id_col))
            .withColumn("_sem_dup", F.lit(True))
        )
        tagged = tagged.join(sem_ids, id_col, "left")
    else:
        tagged = tagged.withColumn("_sem_dup", F.lit(None).cast("boolean"))

    if benchmark is not None:
        rep = contamination_report(
            docs,
            benchmark,
            k=contamination_k,
            min_overlap=contamination_min_overlap,
            id_col=id_col,
            text_col=text_col,
        )
        bad = (
            rep.filter(F.col("contaminated"))
            .select(F.col("doc_id").alias(id_col))
            .distinct()
            .withColumn("_contam", F.lit(True))
        )
        tagged = tagged.join(bad, id_col, "left")
    else:
        tagged = tagged.withColumn("_contam", F.lit(None).cast("boolean"))

    # ---- row-local stages (pure expressions, no extra scan) ----------
    if c4:
        cleaned = c4_clean_lines(text_col, min_words=c4_min_words)
        lowered = F.lower(F.col(text_col))
        has_bad = F.lit(False)
        for w in c4_badwords:
            has_bad = has_bad | lowered.contains(w.lower())
        tagged = tagged.withColumn("_c4_text", cleaned).withColumn(
            "_c4_fail",
            (
                F.size(
                    F.filter(
                        F.split(F.col("_c4_text"), r'\n|(?<=[.!?"”])\s+'),
                        lambda s: s.rlike(r'[.!?"”]\s*$'),
                    )
                )
                < c4_min_sentences
            )
            | has_bad
            | F.col(text_col).contains("{"),
        )
        eff_text = F.col("_c4_text")
    else:
        tagged = tagged.withColumn("_c4_fail", F.lit(None).cast("boolean"))
        eff_text = F.col(text_col)

    if gopher:
        g = gopher_signals(eff_text)
        tagged = tagged.withColumn(
            "_gopher_fail",
            ~(
                (g["n_words"] >= 50)
                & (g["n_words"] <= 100_000)
                & (g["mean_word_len"] >= 3.0)
                & (g["mean_word_len"] <= 10.0)
                & (g["symbol_word_ratio"] <= 0.1)
                & (g["bullet_line_frac"] <= 0.9)
                & (g["ellipsis_line_frac"] <= 0.3)
                & (g["alpha_word_frac"] >= 0.8)
                & (g["stopword_hits"] >= 2)
            ),
        )
    else:
        tagged = tagged.withColumn(
            "_gopher_fail", F.lit(None).cast("boolean")
        )

    rep_fail = F.lit(False)
    any_rep = False
    if max_dup_line_frac is not None:
        rep_fail = rep_fail | (
            duplicate_line_fraction(eff_text) > max_dup_line_frac
        )
        any_rep = True
    if max_top_bigram_frac is not None:
        rep_fail = rep_fail | (
            top_ngram_fraction(eff_text, 2) > max_top_bigram_frac
        )
        any_rep = True
    if max_dup_5gram_char_frac is not None:
        rep_fail = rep_fail | (
            dup_ngram_char_fraction(eff_text, 5) > max_dup_5gram_char_frac
        )
        any_rep = True
    tagged = tagged.withColumn(
        "_rep_fail", rep_fail if any_rep else F.lit(None).cast("boolean")
    )

    q_fail = F.lit(False)
    any_q = False
    n_chars = F.length(eff_text)
    if min_chars is not None:
        q_fail = q_fail | (n_chars < min_chars)
        any_q = True
    if max_chars is not None:
        q_fail = q_fail | (n_chars > max_chars)
        any_q = True
    if max_punct_ratio is not None:
        punct = F.size(F.split(eff_text, r"[^A-Za-z0-9\s]")) - 1
        q_fail = q_fail | (
            punct / F.greatest(n_chars, F.lit(1)) > max_punct_ratio
        )
        any_q = True
    tagged = tagged.withColumn(
        "_q_fail", q_fail if any_q else F.lit(None).cast("boolean")
    )

    if lm_model is not None and max_ppl is not None:
        from autoprepad_spark.operators.lm_quality import ppl_expr

        p = ppl_expr(lm_model, eff_text, backoff=lm_backoff)
        tagged = tagged.withColumn(
            "_ppl_fail", F.coalesce(p > float(max_ppl), F.lit(True))
        )
    else:
        tagged = tagged.withColumn("_ppl_fail", F.lit(None).cast("boolean"))

    # ---- one tag column, one audit agg, one filtered slice -----------
    drop_stage = (
        F.when(F.col("_exact_dup"), "exact_dup")
        .when(F.col("_near_dup"), "near_dup")
        .when(F.col("_sem_dup"), "semantic_dup")
        .when(F.col("_contam"), "contaminated")
        .when(F.col("_c4_fail"), "c4")
        .when(F.col("_gopher_fail"), "gopher")
        .when(F.col("_rep_fail"), "repetition")
        .when(F.col("_q_fail"), "quality")
        .when(F.col("_ppl_fail"), "perplexity")
    )
    tagged = tagged.withColumn("_drop_stage", drop_stage)

    audit = (
        tagged.groupBy(
            F.coalesce(F.col("_drop_stage"), F.lit("kept")).alias("stage")
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )

    out_cols = [
        F.col("_c4_text").alias(text_col)
        if (c4 and c == text_col)
        else F.col(c)
        for c in docs.columns
    ]
    clean = tagged.filter(F.col("_drop_stage").isNull()).select(*out_cols)
    return clean, audit
