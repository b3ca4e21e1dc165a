"""BPE tokenizer: Sennrich worked example, DuckDB-checked fit counts,
round-trip/count invariants, parallelism-independence, plan shape."""

import duckdb
import pytest

from autoprepad_spark.operators import tokenizer as T
from pyspark.sql import functions as F

# the classic Sennrich et al. (2016) learn-BPE example corpus
SENNRICH = [("low " * 5), ("lower " * 2), ("newest " * 6), ("widest " * 3)]

DOCS = [
    (0, "Hello, world! Hello again."),
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "lower newest widest low low"),
    (3, "numbers 123 and 45, plus punctuation!!!"),
    (4, ""),
    (5, None),
    (6, "  Whitespace \t\n collapsed   here  "),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def model(spark, docs):
    return T.fit_bpe(docs, num_merges=50)


def _py_pre_tokens(text):
    import re

    if text is None:
        return []
    norm = re.sub(r"\s+", " ", text.lower()).strip()
    return re.findall(r"[a-z]+|[0-9]|[^a-z0-9\s]", norm)


def test_sennrich_worked_example(spark):
    df = spark.createDataFrame([(t,) for t in SENNRICH], ["text"])
    m = T.fit_bpe(df, num_merges=5)
    # max-count merges, ties broken by lexicographically smallest pair:
    # (e,s)=9 -> (es,t)=9 -> (est,</w>)=9 -> (l,o)=7 -> (lo,w)=7
    assert m["merges"] == [
        ("e", "s"),
        ("es", "t"),
        ("est", T.EOW),
        ("l", "o"),
        ("lo", "w"),
    ]
    ranks = {p: i for i, p in enumerate(m["merges"])}
    assert T.encode_word("lowest", ranks) == ["low", "est" + T.EOW]
    assert T.encode_word("newest", ranks) == ["n", "e", "w", "est" + T.EOW]


def test_word_counts_match_duckdb(spark, docs):
    got = {
        r["word"]: r["count"]
        for r in T.word_counts(docs, "text").collect()
    }
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    want = {
        w: c
        for w, c in con.execute(
            r"""
            SELECT u.word, count(*) AS c FROM (
              SELECT unnest(regexp_extract_all(
                trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                '[a-z]+|[0-9]|[^a-z0-9\s]')) AS word
              FROM docs WHERE text IS NOT NULL
            ) u GROUP BY 1
            """
        ).fetchall()
    }
    assert got == want


def test_encode_round_trip_and_counts(spark, docs, model):
    out = {
        r["doc_id"]: (r["tokens"], r["n"])
        for r in T.bpe_token_count(docs, model, out_col="n")
        .join(
            T.bpe_encode(docs, model).select("doc_id", "tokens"), "doc_id"
        )
        .collect()
    }
    ranks = {p: i for i, p in enumerate(model["merges"])}
    for doc_id, text in DOCS:
        ids, n = out[doc_id]
        assert n == len(ids)
        pre = _py_pre_tokens(text)
        # decode is lossless back to the pre-token stream
        assert T.decode_ids(model, ids) == " ".join(pre)
        # the UDF agrees with the driver-side reference per word
        want = [
            model["vocab"][s] for w in pre for s in T.encode_word(w, ranks)
        ]
        assert ids == want


def test_parallelism_independent(spark, docs, model):
    a = T.bpe_encode(docs.repartition(1), model).orderBy("doc_id").collect()
    b = T.bpe_encode(docs.repartition(7), model).orderBy("doc_id").collect()
    assert [r["tokens"] for r in a] == [r["tokens"] for r in b]


def test_unknown_symbols_map_to_unk(spark, docs, model):
    assert "ß" not in model["vocab"]
    extra = spark.createDataFrame([(9, "straße")], "doc_id long, text string")
    [row] = T.bpe_encode(extra, model).collect()
    assert T.UNK_ID in row["tokens"]


def test_encode_plan_is_row_local(spark, docs, model):
    plan = (
        T.bpe_encode(docs, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Join" not in plan
    assert "ArrowEvalPython" in plan


def test_real_count_tracks_estimator(spark, docs, model):
    # the cheap estimator counts pre-tokens; BPE can only split further
    # within a word, never across, so real count >= per-word minimum 1
    # and both count the same units when every word is in-vocab whole.
    from autoprepad_spark.operators.text import bpe_ish_token_count

    rows = (
        T.bpe_token_count(docs, model, out_col="real")
        .withColumn("est", bpe_ish_token_count(F.col("text")))
        .collect()
    )
    for r in rows:
        est = r["est"] if r["est"] is not None else 0
        assert r["real"] >= est or r["real"] == 0
