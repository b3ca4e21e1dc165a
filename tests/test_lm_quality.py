"""Bigram-LM perplexity: fit counts vs a DuckDB oracle, scores vs the
exact driver-side reference scorer, plan shape (no joins/shuffles in
the scoring plan), and the CCNet-style gate behavior (reference-like
docs score below gibberish)."""

from __future__ import annotations

import math
import re

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from autoprepad_spark.operators import lm_quality as LM


def _mk_ref(i: int, n: int = 30) -> str:
    # skewed Zipf-ish draws from a 60-word vocab: plenty of repeated bigrams
    rng = np.random.default_rng([21, i])
    return " ".join(f"t{v}" for v in rng.zipf(1.6, n) % 60)


REF = [(i, _mk_ref(i)) for i in range(300)]
DOCS = (
    [(900 + i, _mk_ref(5000 + i)) for i in range(20)]       # reference-like
    + [(950, "zz qq xx vv kk zz qq")]                        # OOV gibberish
    + [(951, "t1")]                                          # single known
    + [(952, "unknownword")]                                 # single unknown
    + [(953, ""), (954, None)]                               # no evidence
)


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.strip().lower())


@pytest.fixture(scope="module")
def model(spark):
    ref = spark.createDataFrame(REF, ["doc_id", "text"])
    return LM.fit_bigram_lm(
        ref, max_vocab=100, min_bigram_count=2, max_bigrams=2000
    )


def test_fit_counts_match_duckdb(spark, model):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ref AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{t}')" for i, t in REF)
        + ") v(doc_id, text)"
    )
    uni = dict(
        con.execute(
            """
            WITH w AS (SELECT unnest(string_split(trim(lower(text)), ' ')) t
                       FROM ref)
            SELECT t, count(*) c FROM w WHERE t != '' GROUP BY t
            ORDER BY c DESC, t LIMIT 100
            """
        ).fetchall()
    )
    assert model["uni"] == uni
    assert model["n_tokens"] == con.execute(
        "SELECT count(*) FROM (SELECT unnest(string_split(trim(lower(text)), ' ')) t FROM ref) WHERE t != ''"
    ).fetchone()[0]
    bi = dict(
        con.execute(
            """
            WITH w AS (
              SELECT doc_id, string_split(trim(lower(text)), ' ') ws FROM ref
            ), p0 AS (
              SELECT unnest(list_transform(range(1, len(ws)),
                            i -> ws[i] || ' ' || ws[i+1])) AS pair
              FROM w
            ), p AS (
              SELECT pair, split_part(pair, ' ', 1) a,
                     split_part(pair, ' ', 2) b FROM p0
            ), keep AS (SELECT t FROM (
              SELECT unnest(string_split(trim(lower(text)), ' ')) t FROM ref)
              WHERE t != '' GROUP BY t ORDER BY count(*) DESC, t LIMIT 100)
            SELECT pair, count(*) c FROM p
            WHERE a IN (SELECT t FROM keep) AND b IN (SELECT t FROM keep)
            GROUP BY pair HAVING count(*) >= 2
            ORDER BY c DESC, pair LIMIT 2000
            """
        ).fetchall()
    )
    assert model["bi"] == bi


@pytest.mark.parametrize("mode", ["udf", "map"])
def test_scores_match_reference_scorer(spark, model, mode):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["ppl"]
        for r in LM.perplexity(docs, model, backoff=0.1, mode=mode).collect()
    }
    for doc_id, text in DOCS:
        if text is None or _norm(text) == "":
            assert got[doc_id] is None, doc_id
            continue
        want = math.exp(LM.log_prob_oracle(model, _norm(text).split(" "), 0.1))
        assert got[doc_id] == pytest.approx(want, rel=1e-12), doc_id


def test_scoring_plan_has_no_join_or_exchange(spark, model):
    docs = spark.createDataFrame(DOCS[:5], "doc_id long, text string")
    plan = (
        LM.perplexity(docs, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_gate_separates_reference_like_from_gibberish(spark, model):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    scored = LM.perplexity(docs, model).collect()
    ref_like = [r["ppl"] for r in scored if 900 <= r["doc_id"] < 920]
    gibberish = next(r["ppl"] for r in scored if r["doc_id"] == 950)
    assert max(ref_like) < gibberish
    kept = {
        r["doc_id"]
        for r in LM.ppl_filter(docs, model, max_ppl=max(ref_like)).collect()
    }
    assert kept >= set(range(900, 920))          # all reference-like kept
    assert kept.isdisjoint({950, 952, 953, 954})  # OOV + no-evidence dropped


def test_clean_corpus_perplexity_stage(spark, model):
    from autoprepad_spark.plans.corpus import clean_corpus

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    scored = LM.perplexity(docs, model).collect()
    cut = max(r["ppl"] for r in scored if 900 <= r["doc_id"] < 920)
    clean, audit = clean_corpus(
        docs, exact_dedup=False, lm_model=model, max_ppl=cut
    )
    kept = {r["doc_id"] for r in clean.collect()}
    want = {
        r["doc_id"]
        for r in scored
        if r["ppl"] is not None and r["ppl"] <= cut
    }
    assert kept == want
    stages = {r["stage"]: r["n_docs"] for r in audit.collect()}
    assert stages["perplexity"] == len(DOCS) - len(want)
    # still one scan: no join for the row-local LM stage
    assert "Join" not in clean._jdf.queryExecution().executedPlan().toString()
