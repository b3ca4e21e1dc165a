"""SemDeDup (semantic dedup over embeddings) and C4 heuristic cleaning:
semantics vs independent Python oracles, determinism, and edge cases.
"""

from __future__ import annotations

import random
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from autoprepad_spark.operators.similarity import ivf_build, semantic_duplicates
from autoprepad_spark.operators.text import c4_clean_lines, c4_page_filter

DIM = 8
EPS = 0.92


def _mk_vectors():
    """Seeded corpus: a few tight semantic clusters (cosine ~0.99 within)
    plus isolated vectors."""
    rnd = np.random.RandomState(3)
    rows = []
    vid = 0
    for _ in range(5):  # 5 tight groups of 4
        base = rnd.randn(DIM)
        for _ in range(4):
            v = base + rnd.randn(DIM) * 0.02
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for _ in range(20):  # isolated
        rows.append((vid, [float(x) for x in rnd.randn(DIM)]))
        vid += 1
    rows.append((vid, rows[0][1]))  # exact copy of vec 0
    return rows


def _python_oracle(rows, centroids, eps):
    """Independent greedy SemDeDup: assign to nearest centroid, then per
    cell scan in (-centroid_sim, id) order, keep unless within eps of a
    kept vector."""
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )
    keep = {}
    cells: dict[int, list] = {}
    for vid, vec in rows:
        v = np.asarray(vec, dtype=np.float64)
        v = v / max(np.linalg.norm(v), 1e-12)
        sims = v @ cn.T
        c = int(np.argmax(sims))
        cells.setdefault(c, []).append((vid, v, float(sims[c])))
    for c, members in cells.items():
        members.sort(key=lambda t: (-t[2], t[0]))
        kept_vecs: list[np.ndarray] = []
        for vid, v, _ in members:
            if not kept_vecs or max(float(k @ v) for k in kept_vecs) < eps:
                keep[vid] = True
                kept_vecs.append(v)
            else:
                keep[vid] = False
    return keep


def test_semdedup_matches_python_oracle(spark):
    rows = _mk_vectors()
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    _, centroids = ivf_build(
        df, n_cells=4, id_col="vec_id", vec_col="embedding", seed=42
    )
    got = {
        r["vec_id"]: r["keep"]
        for r in semantic_duplicates(df, eps=EPS, n_cells=4, seed=42).collect()
    }
    want = _python_oracle(rows, centroids, EPS)
    assert got == want
    # the engineered clusters actually deduplicate: fewer kept than rows
    assert sum(got.values()) < len(rows)
    # exact copy of vec 0 (last id) is never kept alongside it
    last = rows[-1][0]
    assert not (got[0] and got[last])


def test_semdedup_parallelism_independent(spark):
    rows = _mk_vectors()
    a = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(1)
    b = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(8)
    ra = {r["vec_id"]: r["keep"] for r in semantic_duplicates(a, eps=EPS, n_cells=4).collect()}
    rb = {r["vec_id"]: r["keep"] for r in semantic_duplicates(b, eps=EPS, n_cells=4).collect()}
    assert ra == rb


def test_semdedup_guards(spark):
    rows = _mk_vectors()
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    with pytest.raises(ValueError, match="eps"):
        semantic_duplicates(df, eps=1.5)
    with pytest.raises(Exception, match="max_cell_size"):
        semantic_duplicates(df, eps=EPS, n_cells=1, max_cell_size=5).collect()


# ---------------------------------------------------------------- C4 ----

_TERM = r'[.!?"”]\s*$'


def _py_keep_line(l: str, min_words: int = 3) -> bool:
    l = l.strip()
    return bool(
        re.search(_TERM, l)
        and len(re.split(r"\s+", l)) >= min_words
        and "javascript" not in l.lower()
    )


def _py_clean(text: str, min_words: int = 3) -> str:
    return "\n".join(
        l.strip() for l in text.split("\n") if _py_keep_line(l, min_words)
    )


def _py_sentences(cleaned: str) -> int:
    segs = re.split(r'\n|(?<=[.!?"”])\s+', cleaned)
    return sum(1 for s in segs if re.search(_TERM, s))


_DOCS = [
    (0, "This is a fine sentence. Another good one follows here!\n"
        "short.\nNo terminal punctuation here\n"
        "Enable javascript to continue.\nA third proper sentence?"),
    (1, "One sentence only here."),
    (2, "Good sentence number one. Good sentence number two. "
        "Good sentence number three. Good four is here. And five closes it."),
    (3, "Curly braces { appear } in this doc. Sentence two is fine. "
        "Three here. Four here too. Five closes it out."),
    (4, "Contains lorem ipsum filler text. Two sentences here. "
        "Three now. Four now. Five closes."),
    (5, ""),
    (6, 'He said "stop." Then another sentence came. A third one here. '
        "A fourth one too. Plus a fifth sentence!"),
]


def test_c4_clean_lines_matches_python(spark):
    df = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["c"]
        for r in df.select(
            "doc_id", c4_clean_lines("text").alias("c")
        ).collect()
    }
    for i, t in _DOCS:
        assert got[i] == _py_clean(t), (i, got[i])


def test_c4_page_filter_matches_python(spark):
    df = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in c4_page_filter(df).collect()}
    for i, t in _DOCS:
        cleaned = _py_clean(t)
        r = out[i]
        assert r["c4_text"] == cleaned
        assert r["n_sentences"] == _py_sentences(cleaned), (i, r["n_sentences"])
        assert r["has_badword"] == ("lorem ipsum" in t.lower())
        assert r["has_brace"] == ("{" in t)
        assert r["c4_keep"] == (
            _py_sentences(cleaned) >= 5
            and "lorem ipsum" not in t.lower()
            and "{" not in t
        )
    # spot-check intended outcomes
    assert out[2]["c4_keep"] and out[6]["c4_keep"]
    assert not out[0]["c4_keep"]  # only 3 surviving sentences
    assert not out[3]["c4_keep"]  # brace
    assert not out[4]["c4_keep"]  # badword
    assert not out[5]["c4_keep"]  # empty


def test_c4_on_random_corpus(spark):
    """Fuzz: random multi-line docs, every row must match the oracle."""
    rnd = random.Random(13)
    frags = [
        "a proper short sentence.", "word", "needs javascript here.",
        "this one has no end", "two tokens.", "ends with bang!",
        "is this a question?", "brace { inside.", "lorem ipsum strikes.",
        'quoted end."',
    ]
    docs = [
        (i, "\n".join(rnd.choice(frags) for _ in range(rnd.randrange(0, 9))))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in c4_page_filter(df).collect()}
    for i, t in docs:
        cleaned = _py_clean(t)
        assert out[i]["c4_text"] == cleaned, (i, t)
        assert out[i]["n_sentences"] == _py_sentences(cleaned), (i, t)


def test_semdedup_projected_compress_then_cluster(spark):
    """project_dim runs SemDeDup in JL-compressed space (the shuffle-byte
    scale path). On the engineered corpus the tight clusters (cosine
    ~0.999 within) must still collapse (8d -> 4d) and the schema/determinism
    contract must hold; compressed keeps are parallelism-independent."""
    rows = _mk_vectors()
    a = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(1)
    b = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(8)
    ra = {
        r["vec_id"]: r["keep"]
        for r in semantic_duplicates(
            a, eps=EPS, n_cells=4, project_dim=4
        ).collect()
    }
    rb = {
        r["vec_id"]: r["keep"]
        for r in semantic_duplicates(
            b, eps=EPS, n_cells=4, project_dim=4
        ).collect()
    }
    assert ra == rb
    assert len(ra) == len(rows)
    # the 5 tight 4-groups + 1 exact copy still deduplicate in 8d:
    # strictly fewer kept than rows, and the exact copy of vec 0 can
    # never survive alongside vec 0 (projection preserves equality)
    assert sum(ra.values()) < len(rows)
    last = rows[-1][0]
    assert not (ra[0] and ra[last])
