"""Linear quality classifier: fit counts vs DuckDB oracle, weight
formula exactness, map-vs-join path agreement, and plan shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from autoprepad_spark.operators.classifier import (
    expected_weight,
    fit_term_weights,
    score_documents,
)

LABELED = [
    ("a", True, "good clean prose with varied words"),
    ("b", True, "clean thoughtful prose and good structure"),
    ("c", False, "spam spam buy buy click click spam"),
    ("d", False, "click here buy now spam offer"),
    ("e", True, "varied thoughtful words and clean writing"),
]


def _labeled(spark):
    return spark.createDataFrame(LABELED, ["doc_id", "label", "text"])


def test_fit_counts_match_duckdb(spark):
    got = {r["term"]: r for r in fit_term_weights(_labeled(spark), "label").collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join("(?,?,?)" for _ in LABELED)
        + ") v(doc_id, label, text)",
        [x for row in LABELED for x in row],
    )
    oracle = con.execute("""
        WITH w AS (
          SELECT label, unnest(string_split(regexp_replace(lower(trim(text)),
                 '\\s+', ' ', 'g'), ' ')) AS term FROM t
        )
        SELECT term,
               sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos,
               sum(CASE WHEN label THEN 0 ELSE 1 END) AS n_neg
        FROM w WHERE length(term) > 0 GROUP BY term
    """).fetchall()
    tp = sum(r[1] for r in oracle)
    tn = sum(r[2] for r in oracle)
    assert set(got) == {r[0] for r in oracle}
    for term, n_pos, n_neg in oracle:
        g = got[term]
        assert (g["n_pos"], g["n_neg"]) == (n_pos, n_neg), term
        assert g["weight"] == pytest.approx(
            expected_weight(n_pos, n_neg, tp, tn), rel=1e-12
        )


def test_min_count_prunes_without_changing_weights(spark):
    full = {r["term"]: r["weight"]
            for r in fit_term_weights(_labeled(spark), "label").collect()}
    pruned = {r["term"]: r["weight"]
              for r in fit_term_weights(_labeled(spark), "label", min_count=2).collect()}
    assert set(pruned) < set(full)
    for term, w in pruned.items():
        assert w == full[term]


def test_map_path_exact_and_join_path_agrees(spark):
    # exact binary-rational weights -> double sums are exact
    weights = {"good": 0.5, "spam": -0.75, "clean": 0.25, "buy": -0.5}
    docs = spark.createDataFrame(
        [("x", "good clean text"), ("y", "spam buy spam"), ("z", "nothing known")],
        ["doc_id", "text"],
    )
    m = {r["doc_id"]: r for r in
         score_documents(docs, weights, threshold=0.0).collect()}  # udf
    mm = {r["doc_id"]: r for r in
          score_documents(docs, weights, threshold=0.0, mode="map").collect()}
    assert {k: v["score"] for k, v in m.items()} == {
        k: v["score"] for k, v in mm.items()
    }
    assert m["x"]["score"] == 0.75 and m["x"]["keep"]
    assert m["y"]["score"] == -2.0 and not m["y"]["keep"]
    assert m["z"]["score"] == 0.0 and m["z"]["keep"]

    wdf = spark.createDataFrame(
        list(weights.items()), "term string, weight double"
    )
    j = {r["doc_id"]: r for r in
         score_documents(docs, wdf, mode="join", id_cols=["doc_id"]).collect()}
    for k in m:
        assert j[k]["score"] == m[k]["score"] and j[k]["keep"] == m[k]["keep"]


def test_end_to_end_fit_then_filter(spark):
    w = fit_term_weights(_labeled(spark), "label")
    scored = score_documents(
        _labeled(spark), w, id_cols=["doc_id"], mode="map"
    )
    rows = {r["doc_id"]: r for r in scored.collect()}
    assert all(rows[d]["keep"] for d in ("a", "b", "e"))
    assert not rows["c"]["keep"]
    assert not rows["d"]["keep"]


def test_scoring_plans_are_row_local(spark):
    docs = spark.createDataFrame([("x", "a b c")], ["doc_id", "text"])
    # auto = Arrow-UDF: row-local (no join/exchange), vectorized Python
    plan = (
        score_documents(docs, {"a": 1.0}, threshold=0.5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan
    assert "ArrowEvalPython" in plan
    # explicit map mode: zero Python at all
    plan = (
        score_documents(docs, {"a": 1.0}, threshold=0.5, mode="map")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan
