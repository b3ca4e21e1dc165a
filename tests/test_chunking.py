"""chunk_tokens — fixed context-window splitting with stride.

Oracle: DuckDB re-derives every window by list slicing over
generate_series (exact, same 1-based inclusive-clamped slice
semantics), so window ids, offsets, and token payloads are compared
value-exactly. Plus a reconstruction property (stride == length
windows concatenate back to the document) and a plan-shape assertion
(row-local: no Exchange, no Python).
"""

import duckdb
import numpy as np
import pytest

from autoprepad_spark.operators.packing import chunk_tokens


@pytest.fixture(scope="module")
def token_docs(spark):
    rng = np.random.default_rng(42)
    rows = []
    for i in range(50):
        n = int(rng.integers(0, 40))
        rows.append((f"d{i:03d}", rng.integers(0, 1000, n).tolist()))
    rows.append(("d-empty", []))
    rows.append(("d-null", None))
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>"
    ).cache()


def _duck_windows(rows, length, stride, keep_partial, min_len):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id text, tokens int[])")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    pred = (
        f"len(w) >= {min_len}" if keep_partial else f"len(w) = {length}"
    )
    return con.execute(
        f"""
        SELECT doc_id, i AS window_id, i*{stride} AS start, w
        FROM (
          SELECT doc_id, i,
                 tokens[i*{stride}+1 : i*{stride}+{length}] AS w
          FROM t, unnest(generate_series(
                 0, cast(ceil(len(tokens)/{stride}.0) AS int) - 1)) AS u(i)
          WHERE len(tokens) > 0
        ) WHERE {pred}
        """
    ).fetchall()


@pytest.mark.parametrize(
    "length,stride,keep_partial,min_len",
    [(8, 8, True, 1), (8, 4, True, 1), (8, 4, False, 1), (5, 7, True, 3)],
)
def test_chunk_tokens_matches_duckdb(
    token_docs, length, stride, keep_partial, min_len
):
    got = {
        (r["doc_id"], r["window_id"], r["start"], tuple(r["tokens"]))
        for r in chunk_tokens(
            token_docs,
            length=length,
            stride=stride,
            keep_partial=keep_partial,
            min_len=min_len,
        ).collect()
    }
    rows = [(r["doc_id"], r["tokens"]) for r in token_docs.collect()]
    want = {
        (d, i, s, tuple(w))
        for d, i, s, w in _duck_windows(
            rows, length, stride, keep_partial, min_len
        )
    }
    assert got == want and len(got) > 20


def test_chunk_tokens_reconstructs_document(token_docs):
    """stride == length, partials kept: windows concatenate back."""
    wins = chunk_tokens(token_docs, length=8).collect()
    by_doc = {}
    for r in sorted(wins, key=lambda r: (r["doc_id"], r["window_id"])):
        by_doc.setdefault(r["doc_id"], []).extend(r["tokens"])
        assert r["start"] == r["window_id"] * 8
        assert r["n_tok"] == len(r["tokens"]) <= 8
    for r in token_docs.collect():
        if r["tokens"]:
            assert by_doc[r["doc_id"]] == list(r["tokens"])
        else:
            assert r["doc_id"] not in by_doc


def test_chunk_tokens_plan_is_row_local(token_docs):
    plan = (
        chunk_tokens(token_docs, length=8, stride=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("Exchange", "Python", "SortMergeJoin"):
        assert bad not in plan, f"{bad} in chunk_tokens plan"


def test_chunk_tokens_rejects_bad_args(token_docs):
    with pytest.raises(ValueError):
        chunk_tokens(token_docs, length=0)
    with pytest.raises(ValueError):
        chunk_tokens(token_docs, length=8, stride=-1)
