"""Token-domain dedup/decontamination (operators/token_ops.py): Python
oracles for gram semantics, report values, minhash recall + exact
Jaccard, exact-dup groups; parallelism-independence throughout."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from autoprepad_spark.operators.token_ops import (
    token_contamination_report,
    token_exact_duplicates,
    token_gram_hashes,
    token_gram_index,
    token_minhash_pairs,
)


def _mk_tokens(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>"
    )


def _py_grams(toks: list[int], n: int) -> set[tuple[int, ...]]:
    if len(toks) < n:
        return {tuple(toks)}
    return {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_gram_hashes_match_python_semantics(spark):
    # hash VALUES are engine-internal; what must match the Python oracle
    # is the EQUALITY STRUCTURE: same gram <-> same hash, distinct grams
    # <-> distinct hashes, count of distinct grams per doc.
    rows = [
        ("a", [1, 2, 3, 4, 5, 6]),
        ("b", [2, 3, 4, 1, 2, 3, 4]),  # repeated gram -> distinct dedups
        ("c", [1, 2]),                  # shorter than n -> whole-seq gram
        ("d", [1, 2]),                  # identical short seq -> same gram
        ("e", []),                      # empty -> one whole-seq gram
    ]
    n = 3
    df = _mk_tokens(spark, rows)
    got = {
        r["doc_id"]: r["g"]
        for r in df.select(
            "doc_id", token_gram_hashes("tokens", n).alias("g")
        ).collect()
    }
    py = {d: _py_grams(t, n) for d, t in rows}
    # per-doc distinct-gram counts
    for d, t in rows:
        assert len(got[d]) == len(py[d]), d
    # cross-doc equality structure: hash sets intersect exactly where
    # gram sets intersect
    for da, ta in rows:
        for db, tb in rows:
            inter_py = len(py[da] & py[db])
            inter_h = len(set(got[da]) & set(got[db]))
            assert inter_h == inter_py, (da, db)


def test_gram_hashes_bag_mode_keeps_positions(spark):
    df = _mk_tokens(spark, [("a", [7, 7, 7, 7])])
    got = df.select(
        token_gram_hashes("tokens", 2, distinct=False).alias("g")
    ).first()["g"]
    assert len(got) == 3 and len(set(got)) == 1  # 3 positions, 1 value


def test_contamination_report_values(spark):
    # bench item b1 = grams of doc d1's slice -> d1 contaminated at 1.0;
    # d2 shares half of b2's grams; d3 clean.
    n = 3
    corpus = _mk_tokens(
        spark,
        [
            ("d1", [10, 11, 12, 13, 14, 15]),
            ("d2", [20, 21, 22, 99, 98, 97]),
            ("d3", [50, 51, 52, 53]),
        ],
    )
    bench = spark.createDataFrame(
        [
            ("b1", [10, 11, 12, 13, 14, 15]),  # == d1
            ("b2", [20, 21, 22, 23]),          # shares gram (20,21,22) with d2
        ],
        "bench_id string, tokens array<int>",
    )
    rep = token_contamination_report(
        corpus, bench, n=n, min_overlap=0.5
    ).collect()
    by = {(r["doc_id"], r["bench_id"]): r for r in rep}
    assert set(by) == {("d1", "b1"), ("d2", "b2")}
    r11 = by[("d1", "b1")]
    assert r11["n_hits"] == 4 and r11["bench_n_shingles"] == 4
    assert r11["contaminated"] is True
    r22 = by[("d2", "b2")]
    assert r22["n_hits"] == 1 and r22["bench_n_shingles"] == 2
    assert r22["overlap_frac"] == pytest.approx(0.5)
    assert r22["contaminated"] is True  # 0.5 >= min_overlap


def test_contamination_parallelism_independent(spark):
    corpus = _mk_tokens(
        spark,
        [(f"d{i}", [i, i + 1, i + 2, i + 3, i + 4]) for i in range(200)],
    )
    bench = spark.createDataFrame(
        [("b0", [5, 6, 7, 8, 9]), ("b1", [100, 101, 102, 103, 104])],
        "bench_id string, tokens array<int>",
    )
    outs = []
    for parts in (1, 7):
        rep = token_contamination_report(
            corpus.repartition(parts), bench, n=4
        )
        outs.append(
            sorted(
                (r["doc_id"], r["bench_id"], r["n_hits"])
                for r in rep.collect()
            )
        )
    assert outs[0] == outs[1] and outs[0]  # non-empty, identical


def _py_jaccard(a: list[int], b: list[int], n: int) -> float:
    ga, gb = _py_grams(a, n), _py_grams(b, n)
    return len(ga & gb) / len(ga | gb)


def test_minhash_pairs_recall_and_exact_jaccard(spark):
    # 30 base docs of 60 tokens; every third doc gets a near-copy with
    # one substitution (J ~ 0.84 with n=5) -> those pairs MUST be found
    # with their exact gram Jaccard; unrelated docs must not pair.
    n = 5
    base = {}
    rows = []
    for i in range(30):
        toks = [(i * 1000 + j * 17) % 50000 for j in range(60)]
        base[f"d{i:02d}"] = toks
        rows.append((f"d{i:02d}", toks))
        if i % 3 == 0:
            mut = list(toks)
            mut[30] = 49999 - mut[30]
            base[f"d{i:02d}-v2"] = mut
            rows.append((f"d{i:02d}-v2", mut))
    df = _mk_tokens(spark, rows)
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in token_minhash_pairs(
            df, n=n, threshold=0.8, max_bucket_size=None
        ).collect()
    }
    expected = {}
    ids = sorted(base)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            j = _py_jaccard(base[a], base[b], n)
            if j >= 0.8:
                expected[(a, b)] = j
    assert set(got) == set(expected)
    assert len(expected) == 10  # the 10 mutated twins
    for k, j in expected.items():
        assert got[k] == pytest.approx(j)


def test_minhash_pairs_parallelism_independent(spark):
    rows = []
    for i in range(40):
        toks = [(i * 31 + j) % 1000 for j in range(40)]
        rows.append((f"d{i:02d}", toks))
        if i % 4 == 0:
            rows.append((f"d{i:02d}-c", list(toks)))  # exact copy, J=1.0
    df = _mk_tokens(spark, rows)
    outs = []
    for parts in (1, 8):
        p = token_minhash_pairs(
            df.repartition(parts), n=5, threshold=0.9, max_bucket_size=None
        )
        outs.append(sorted((r["id_a"], r["id_b"]) for r in p.collect()))
    assert outs[0] == outs[1]
    assert len(outs[0]) == 10


def test_token_exact_duplicates(spark):
    rows = [
        ("a1", [1, 2, 3]),
        ("a2", [1, 2, 3]),
        ("a3", [1, 2, 3]),
        ("b1", [1, 2]),    # prefix, NOT a dup of [1,2,3]
        ("c1", [12, 3]),   # "12,3" != "1,2,3" — delimiter unambiguity
        ("d1", []),
        ("d2", []),        # empty sequences group together
    ]
    got = {
        r["tokens_hash"]: r
        for r in token_exact_duplicates(
            _mk_tokens(spark, rows), max_exemplars=2
        ).collect()
    }
    assert len(got) == 2
    by_count = sorted(
        (r["dup_count"], r["doc_ids"]) for r in got.values()
    )
    assert by_count == [(2, ["d1", "d2"]), (3, ["a1", "a2"])]  # bounded K=2


def test_gram_index_feeds_verify(spark):
    # token_gram_index is a drop-in (_id, _h) index: per-doc distinct
    rows = [("a", [5, 5, 5, 5, 5]), ("b", [5, 5, 5])]
    idx = token_gram_index(_mk_tokens(spark, rows), n=3)
    got = sorted((r["_id"], r["_h"]) for r in idx.collect())
    assert len(got) == 2  # one distinct gram each
    assert got[0][1] == got[1][1]  # same gram value across docs


def _py_rep(toks: list[int], n: int) -> float:
    if len(toks) < n + 1:
        return 0.0
    grams = [tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return 1.0 - len(set(grams)) / len(grams)


def _py_run(toks: list[int]) -> int:
    best = cur = 0
    prev = None
    for t in toks:
        cur = cur + 1 if t == prev else 1
        best = max(best, cur)
        prev = t
    return best


def test_token_repetition_profile_matches_python(spark):
    from autoprepad_spark.operators.token_ops import token_repetition_profile

    rows = [
        ("degenerate", [7] * 40),                       # all one token
        ("loop", [1, 2, 3] * 10),                       # repeating trigram
        ("clean", list(range(50))),                     # no repetition
        ("padded", list(range(10)) + [0] * 15),         # pad flooding
        ("short", [5, 5]),                              # < n+1 for n>=2
        ("empty", []),
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = {
        r["doc_id"]: r
        for r in token_repetition_profile(df, ns=(2, 4)).collect()
    }
    for doc_id, toks in rows:
        r = got[doc_id]
        assert r["dup_2gram_frac"] == pytest.approx(_py_rep(toks, 2)), doc_id
        assert r["dup_4gram_frac"] == pytest.approx(_py_rep(toks, 4)), doc_id
        assert r["max_token_run"] == _py_run(toks), doc_id
    assert got["degenerate"]["dup_2gram_frac"] > 0.95
    assert got["clean"]["dup_2gram_frac"] == 0.0
    assert got["padded"]["max_token_run"] == 15
