"""clean_corpus (plans/corpus.py): stage composition, drop priority,
audit bookkeeping, and C4 text replacement on an engineered corpus
where every stage has a known victim.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from autoprepad_spark.plans.corpus import clean_corpus


def _filler(tag: str) -> str:
    return (
        f"The {tag} report begins with a steady opening sentence. "
        f"A second sentence about {tag} matters follows directly. "
        f"Plenty of additional words fill the {tag} body nicely. "
        f"Counting the fourth sentence right at this point. "
        f"A fifth sentence keeps everything moving along. "
        f"The final sentence closes the {tag} document cleanly."
    )


_SPAM = ("spam spam spam spam spam. " * 5).strip()
_FRUIT = (
    "apples bananas cherries dates elderberry figs grapes honeydew "
    "kiwis limes today. " + _filler("fruit")
)
_EXCERPT = "bananas cherries dates elderberry figs grapes honeydew kiwis"

_DOCS = [
    (0, _filler("alpha")),                      # kept (dup canonical)
    (1, _filler("alpha")),                      # exact_dup of 0
    (2, _filler("beta one")),                   # kept (near-dup canonical)
    (3, _filler("beta two")),                   # near_dup (pair with 2)
    (4, _filler("gamma")),                      # semantic_dup (keep=false)
    (5, _filler("delta")),                      # kept (keep=true)
    (6, _FRUIT),                                # contaminated
    (7, "Only one proper sentence lives here. And a second one too."),  # c4
    (8, _filler("epsilon") + " An extra brace { appears."),             # c4
    (9, _SPAM),                                 # repetition (top bigram)
    (10, "Short doc one two three. Ends with four words here. "
         "Third tiny sentence now. Fourth one is short. Fifth closes."),  # quality (<200 chars)
    (11, _filler("zeta") + "\nno terminal punctuation junk line"),      # kept, c4-cleaned
    (12, _SPAM),                                # exact_dup of 9 (priority over repetition)
]


def _run(spark):
    docs = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    pairs = spark.createDataFrame([(2, 3)], ["id_a", "id_b"])
    sem = spark.createDataFrame([(4, False), (5, True)], ["vec_id", "keep"])
    bench = spark.createDataFrame([(0, _EXCERPT)], ["bench_id", "text"])
    return clean_corpus(
        docs,
        near_dup_pairs=pairs,
        semantic_keep=sem,
        benchmark=bench,
        contamination_k=5,
        contamination_min_overlap=0.5,
        c4=True,
        max_top_bigram_frac=0.5,
        max_dup_line_frac=0.9,
        min_chars=200,
        max_chars=10_000,
        max_punct_ratio=0.2,
    )


def test_stage_tags_and_audit(spark):
    clean, audit = _run(spark)
    got = {r["stage"]: r["n_docs"] for r in audit.collect()}
    assert got == {
        "exact_dup": 2,      # 1 (of 0) and 12 (of 9 — beats repetition)
        "near_dup": 1,       # 3
        "semantic_dup": 1,   # 4
        "contaminated": 1,   # 6
        "c4": 2,             # 7 (few sentences), 8 (brace)
        "repetition": 1,     # 9
        "quality": 1,        # 10
        "kept": 4,           # 0, 2, 5, 11
    }
    assert sum(got.values()) == len(_DOCS)
    kept_ids = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert kept_ids == {0, 2, 5, 11}


def test_c4_text_replacement(spark):
    clean, _ = _run(spark)
    t11 = clean.filter("doc_id = 11").select("text").first()[0]
    assert t11 == _filler("zeta")  # junk line stripped by the C4 stage
    t0 = clean.filter("doc_id = 0").select("text").first()[0]
    assert t0 == _filler("alpha")  # clean docs pass through unchanged


def test_all_stages_optional(spark):
    docs = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    clean, audit = clean_corpus(docs, exact_dedup=False)
    got = {r["stage"]: r["n_docs"] for r in audit.collect()}
    assert got == {"kept": len(_DOCS)}
    assert clean.count() == len(_DOCS)
    assert clean.columns == docs.columns


def test_gopher_stage(spark):
    good = " ".join(
        ["the", "value", "of", "and", "that", "signal", "with", "table"] * 8
    )
    docs = spark.createDataFrame(
        [(0, good), (1, "too few words here")], ["doc_id", "text"]
    )
    clean, audit = clean_corpus(docs, exact_dedup=False, gopher=True)
    got = {r["stage"]: r["n_docs"] for r in audit.collect()}
    assert got == {"kept": 1, "gopher": 1}
    assert [r["doc_id"] for r in clean.collect()] == [0]


def test_plan_is_python_free_and_key_bounded(spark):
    """Every stage is JVM-side (no Arrow/Python eval nodes) and every
    shuffle partitions on an expected key — the doc id (drop-list
    joins), the dedup text hash (16-byte (id, hash) pairs, not
    documents), contamination hit keys, or the audit grouping."""
    import re

    docs = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    bench = spark.createDataFrame([(0, _EXCERPT)], ["bench_id", "text"])
    clean, audit = clean_corpus(
        docs, benchmark=bench, c4=True, gopher=True,
        max_top_bigram_frac=0.5, min_chars=10,
    )
    for df in (clean, audit):
        plan = df._jdf.queryExecution().sparkPlan().toString()
        assert "EvalPython" not in plan  # no row- or Arrow-Python nodes
        keys = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
        allowed = {"doc_id", "_h", "bench_id", "probe", "_groupingexpression"}
        assert set(keys) <= allowed, keys


def test_exact_dedup_only(spark):
    docs = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    clean, audit = clean_corpus(docs)
    got = {r["stage"]: r["n_docs"] for r in audit.collect()}
    assert got == {"exact_dup": 2, "kept": len(_DOCS) - 2}
    # canonical (smallest-id) member survives
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert 0 in kept and 1 not in kept and 9 in kept and 12 not in kept


def test_fix_mojibake_repairs_then_dedups(spark):
    clean_text = "café über alles, naïve straße here today"
    moji = clean_text.encode("utf-8").decode("latin-1")
    docs = spark.createDataFrame(
        [(0, clean_text), (1, moji), (2, "plain ascii page kept")],
        "doc_id long, text string",
    )
    clean, audit = clean_corpus(docs, fix_mojibake=True, exact_dedup=True)
    got = {r["stage"]: r["n_docs"] for r in audit.collect()}
    # the mojibake copy repairs to the clean copy and dedups against it
    assert got == {"exact_dup": 1, "kept": 2}
    rows = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert rows == {0: clean_text, 2: "plain ascii page kept"}
    assert clean.columns == docs.columns
    # repair off: the two copies stay distinct
    _, audit_off = clean_corpus(docs, fix_mojibake=False, exact_dedup=True)
    assert {r["stage"]: r["n_docs"] for r in audit_off.collect()} == {
        "kept": 3
    }
