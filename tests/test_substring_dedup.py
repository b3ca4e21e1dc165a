"""Exact-substring dedup (Lee et al. 2022 ExactSubstr, window-hash form):
semantics vs a DuckDB SQL oracle and a pure-Python oracle, survival
properties, pass-through of short docs, and parallelism independence.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from autoprepad_spark.operators.dedup import (
    exact_substring_dedup,
    normalize_text,
    token_windows,
)

W = 5  # test window (the real pass uses ~50)


def _mk_docs():
    """Deterministic corpus with engineered >=W-token verbatim overlaps."""
    rnd = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    span_a = "alpha beta gamma delta epsilon zeta"        # 6 tokens
    span_b = "one two three four five"                    # exactly W tokens
    docs = []
    for i in range(12):
        words = [vocab[rnd.randrange(len(vocab))] for _ in range(rnd.randrange(8, 20))]
        docs.append((i, " ".join(words)))
    # doc 20/21 share span_a (6 tokens -> two overlapping dup windows)
    docs.append((20, "intro text here " + span_a + " trailing words follow"))
    docs.append((21, span_a + " different ending entirely here"))
    # doc 22/23 share span_b exactly (one dup window)
    docs.append((22, "start padding words " + span_b))
    docs.append((23, span_b + " closing remark"))
    # doc 24 is a verbatim copy of doc 20 (fully duplicated)
    doc20 = next(t for i, t in docs if i == 20)
    docs.append((24, doc20))
    # doc 25 is shorter than the window -> passes through normalized
    docs.append((25, "Tiny   Doc"))
    return docs


def _python_oracle(docs, window, keep):
    toks = {i: t.lower().split() for i, t in docs}
    occ: dict[tuple, list] = {}
    for i, ts in sorted(toks.items()):
        for p in range(len(ts) - window + 1):
            occ.setdefault(tuple(ts[p : p + window]), []).append((i, p))
    covered: dict[int, set] = {i: set() for i in toks}
    for positions in occ.values():
        if len(positions) <= 1:
            continue
        drop = positions[1:] if keep == "first" else positions
        for i, p in drop:
            covered[i].update(range(p, p + window))
    return {
        i: " ".join(t for j, t in enumerate(ts) if j not in covered[i])
        for i, ts in toks.items()
    }


def _spark_result(spark, docs, keep="first", n_parts=None):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    if n_parts:
        df = df.repartition(n_parts)
    out = exact_substring_dedup(df, window=W, keep=keep)
    return {r["doc_id"]: r["text"] for r in out.collect()}


def _duckdb_oracle(docs, window, keep):
    """Same algorithm in SQL, keyed on the raw window STRING (the Spark
    side keys on xxhash64 of it — identical results modulo 64-bit hash
    collisions, which the test corpus cannot produce)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", docs)
    rk_guard = "rk > 1" if keep == "first" else "rk >= 1"
    rows = con.execute(f"""
        WITH toks AS (
          SELECT doc_id,
                 string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
          FROM docs
        ),
        wins AS (
          SELECT doc_id, i - 1 AS pos, array_to_string(w[i:i+{window}-1], ' ') AS win
          FROM toks, unnest(generate_series(1, len(w) - {window} + 1)) t(i)
          WHERE len(w) >= {window}
        ),
        marked AS (
          SELECT doc_id, pos,
                 row_number() OVER (PARTITION BY win ORDER BY doc_id, pos) AS rk,
                 count(*) OVER (PARTITION BY win) AS n
          FROM wins
        ),
        removed AS (SELECT doc_id, pos FROM marked WHERE n > 1 AND {rk_guard}),
        cov AS (
          SELECT DISTINCT doc_id, pos + i AS cp
          FROM removed, unnest(generate_series(0, {window} - 1)) t(i)
        ),
        tokpos AS (
          SELECT doc_id, i - 1 AS tp, w[i] AS tok
          FROM toks, unnest(generate_series(1, len(w))) t(i)
        ),
        kept AS (
          SELECT t.doc_id, t.tp, t.tok
          FROM tokpos t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.tp = c.cp
          WHERE c.doc_id IS NULL
        ),
        rebuilt AS (
          SELECT doc_id, string_agg(tok, ' ' ORDER BY tp) AS text
          FROM kept GROUP BY doc_id
        )
        SELECT d.doc_id, coalesce(r.text, '') AS text
        FROM docs d LEFT JOIN rebuilt r USING (doc_id)
    """).fetchall()
    return dict(rows)


@pytest.mark.parametrize("keep", ["first", "none"])
def test_matches_duckdb_and_python_oracles(spark, keep):
    docs = _mk_docs()
    got = _spark_result(spark, docs, keep=keep)
    assert got == _duckdb_oracle(docs, W, keep)
    assert got == _python_oracle(docs, W, keep)


def test_keep_first_leaves_exactly_one_occurrence(spark):
    docs = _mk_docs()
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = exact_substring_dedup(df, window=W, keep="first")
    # after the pass, no window occurs twice (each survivor is unique);
    # re-run detection on the output
    wins = token_windows(out, window=W)
    counts = wins.groupBy("_wh").count().collect()
    assert all(r["count"] == 1 for r in counts)


def test_short_docs_pass_through_normalized(spark):
    docs = _mk_docs()
    got = _spark_result(spark, docs)
    assert got[25] == "tiny doc"


def test_fully_duplicated_doc_is_emptied(spark):
    """doc 24 is a verbatim copy of doc 20: with keep='none' BOTH lose all
    windowed content; with keep='first' the copy keeps nothing that 20
    already covers."""
    docs = _mk_docs()
    none = _spark_result(spark, docs, keep="none")
    first = _spark_result(spark, docs, keep="first")
    orig = {i: t for i, t in docs}
    n20 = len(normalize_and_split(orig[20]))
    assert none[24] == "" and none[20] == ""
    # keep=first: doc 20 (smaller id) keeps its text, doc 24 is gutted
    assert first[20] == " ".join(normalize_and_split(orig[20]))
    assert first[24] == ""
    assert n20 >= W


def normalize_and_split(t: str) -> list[str]:
    return t.lower().split()


def test_parallelism_independent(spark):
    docs = _mk_docs()
    assert _spark_result(spark, docs, n_parts=1) == _spark_result(
        spark, docs, n_parts=8
    )
