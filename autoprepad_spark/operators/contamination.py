"""Benchmark-contamination detection for training corpora.

No reference counterpart (AutoPrepAD validates single tables —
`pipelines/control.py:40` — not corpora); this is the standard
decontamination step of an LLM training-data pipeline: flag training
documents whose word n-grams overlap a held-out evaluation benchmark
(the GPT-3 appendix-C / Llama-2 style check, typically 8-13-gram
overlap), expressed Spark-first:

* the benchmark side is shingled into word k-grams and its DISTINCT
  hashed shingle set is BROADCAST — eval suites are small by
  construction (thousands of items, ~10^5-10^6 shingles) while the
  corpus is the 100-TB side, so the probe join is a map-side broadcast
  hash join and the corpus is never shuffled;
* hits aggregate per (doc, benchmark item) in one groupBy whose key
  count is bounded by TRUE matches (a clean corpus produces ~0 rows),
  never by corpus x benchmark;
* joins compare full 64-bit xxhash64 shingle hashes (collision odds
  ~|bench shingles| / 2^64 per corpus shingle — negligible even at
  10^12 corpus shingles; minhash's 2^31 domain would NOT be: at that
  width a 10^12-shingle corpus manufactures ~10^8 false hits);
* ``decontaminate`` drops flagged docs with one left_anti join on the
  doc id (the keep_one_per_cluster shape: the corpus is never widened
  or re-shuffled; AQE picks broadcast vs shuffle for the drop-list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from autoprepad_spark.operators.dedup import word_shingle_hashes
from autoprepad_spark.functions.arrays import cosine

#: contamination flag: fraction of the benchmark ITEM's shingles that
#: must appear in the document. 0.5 is a common operating point for
#: 8-gram checks; exact inclusion of a short eval item scores 1.0.
DEFAULT_MIN_OVERLAP = 0.5


def benchmark_probes(
    bench: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "bench_id",
    k: int = 8,
    shingle_col: F.Column | None = None,
) -> DataFrame:
    """(bench_id, probe) — the DISTINCT 64-bit-hashed word-k-shingle set
    of each benchmark item. This is the broadcast side; materialize it
    once (e.g. ``.cache()``) when probing several corpus shards.

    ``shingle_col`` overrides the word-shingle expression with any
    array<long> hashed-gram column — how ``token_ops`` reuses this exact
    plan for pre-tokenized sequences (grams over token ids, no text)."""
    sh = shingle_col if shingle_col is not None else word_shingle_hashes(text_col, k)
    return (
        bench.select(
            F.col(id_col).alias("bench_id"),
            F.explode(sh).alias("probe"),
        )
        .distinct()
    )


def contamination_report(
    docs: DataFrame,
    bench: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
    k: int = 8,
    min_overlap: float = DEFAULT_MIN_OVERLAP,
    broadcast_bench: bool = True,
    doc_shingle_col: F.Column | None = None,
    bench_shingle_col: F.Column | None = None,
) -> DataFrame:
    """Per (document, benchmark item) n-gram-overlap report.

    Returns (doc_id, bench_id, n_hits, bench_n_shingles, overlap_frac,
    contaminated) — one row per pair sharing at least one k-shingle;
    ``contaminated`` marks overlap_frac >= min_overlap. The report is
    output-bounded: row count scales with actual overlap, not with
    |corpus| x |benchmark|.

    broadcast_bench=True is the 100-TB plan (map-side hash join, zero
    corpus shuffle) and requires the hashed benchmark shingle set to fit
    executor memory — true for any real eval suite. Set it False only
    for a pathological benchmark side, and AQE chooses the strategy.

    ``doc_shingle_col`` / ``bench_shingle_col`` override the gram
    expression per side (any array<long> hashed-gram column) — the hook
    ``token_ops.token_contamination_report`` uses to run this SAME plan
    over token-id n-grams instead of word shingles.
    """
    probes = benchmark_probes(
        bench, text_col=bench_text_col, id_col=bench_id_col, k=k,
        shingle_col=bench_shingle_col,
    )
    bench_sizes = probes.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("bench_n_shingles")
    )
    if broadcast_bench:
        probes, bench_sizes = F.broadcast(probes), F.broadcast(bench_sizes)

    doc_sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            doc_shingle_col
            if doc_shingle_col is not None
            else word_shingle_hashes(text_col, k)
        ).alias("probe"),
    )

    hits = (
        doc_sh.join(probes, "probe")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return hits.join(bench_sizes, "bench_id").select(
        "doc_id",
        "bench_id",
        "n_hits",
        "bench_n_shingles",
        (F.col("n_hits") / F.col("bench_n_shingles")).alias("overlap_frac"),
        (F.col("n_hits") / F.col("bench_n_shingles") >= min_overlap).alias(
            "contaminated"
        ),
    )


def decontaminate(
    docs: DataFrame,
    report: DataFrame,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """The decontaminated corpus: drop every document the report flags.

    One left_anti join on the doc id against the (tiny relative to the
    corpus) flagged-id list; clean documents pass through untouched and
    the corpus is never widened or re-shuffled."""
    bad = (
        report.filter(F.col("contaminated"))
        .select(F.col("doc_id").alias(id_col))
        .distinct()
    )
    return docs.join(bad, id_col, "left_anti")


def semantic_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    threshold: float = 0.95,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """Embedding-space decontamination: flag training docs whose max
    cosine similarity against ANY benchmark item reaches ``threshold``
    — the paraphrase-robust complement of the k-gram check (n-gram
    overlap misses reworded eval items; embeddings don't).

    Plan: benchmark embeddings BROADCAST (eval suites are tiny vs the
    corpus), corpus streamed ONCE; the per-(doc, bench) cosine scores
    reduce through a map-side-combined max before the only shuffle, so
    exchanged rows are |corpus|, not |corpus| x |bench|. The argmax
    bench id rides the same agg as a struct max (ties break to the
    larger bench id — deterministic). All cosine math is codegen
    (functions.arrays.cosine); for benchmarks too large to broadcast,
    run ivf_topk instead and threshold its output.

    Returns (id_col, max_cos, nearest_bench, contaminated).
    """
    b = benchmark.select(
        F.col(bench_id_col).alias("_bid"), F.col(vec_col).alias("_bv")
    )
    scored = corpus.select(id_col, vec_col).join(F.broadcast(b)).select(
        id_col,
        F.struct(
            cosine(vec_col, "_bv").alias("c"), F.col("_bid").alias("b")
        ).alias("_s"),
    )
    agg = scored.groupBy(id_col).agg(F.max("_s").alias("_m"))
    return agg.select(
        id_col,
        F.col("_m.c").alias("max_cos"),
        F.col("_m.b").alias("nearest_bench"),
        (F.col("_m.c") >= F.lit(float(threshold))).alias("contaminated"),
    )
