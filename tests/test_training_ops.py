"""Unit tests for the training-data pipeline operators (dedup, text,
similarity, encoders) on tiny hand-checkable frames — the reference's
inline example-based check pattern (SURVEY.md §5.1) with real asserts."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from autoprepad_spark.operators import dedup as DD
from autoprepad_spark.operators import similarity as SIM
from autoprepad_spark.operators import text as TX
from autoprepad_spark.functions.encoders import (
    binary_encode,
    fit_vocabulary,
    ordinal_encode,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup
        (4, "completely different text about spark engines and data"),
        (5, "Der schnelle braune Fuchs springt und springt und der Hund"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache()


def test_exact_duplicates(docs):
    groups = DD.exact_duplicates(docs, "text", "doc_id").collect()
    assert len(groups) == 1
    assert groups[0]["dup_count"] == 2


def test_jaccard_pairs(docs):
    pairs = DD.jaccard_pairs(
        docs, text_col="text", id_col="doc_id", k_shingle=3, threshold=0.5,
        max_doc_freq=None,
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert got[(1, 2)] == pytest.approx(1.0)  # identical
    assert (1, 3) in got and 0.5 <= got[(1, 3)] < 1.0  # near dup
    assert not any(4 in p for p in got)  # unrelated doc pairs with no one


def test_minhash_identical_docs_always_candidates(docs):
    sigs = DD.minhash_signatures(docs, text_col="text", id_col="doc_id")
    cand = {
        (r["id_a"], r["id_b"])
        for r in DD.minhash_candidates(sigs, id_col="doc_id", num_hashes=32).collect()
    }
    assert (1, 2) in cand  # identical docs share every band
    assert (1, 4) not in cand and (2, 4) not in cand  # disjoint shingles


def test_minhash_method_paths_identical(docs):
    """agg (codegen explode+agg), map (per-row HOF mins), and explicit
    shingle-frame paths must produce byte-identical signatures — same
    hash family, same distinct-shingle set."""
    base = {
        r["doc_id"]: r["sig"]
        for r in DD.minhash_signatures(docs, text_col="text", id_col="doc_id").collect()
    }
    via_map = {
        r["doc_id"]: r["sig"]
        for r in DD.minhash_signatures(
            docs, text_col="text", id_col="doc_id", method="map"
        ).collect()
    }
    via_frame = {
        r["doc_id"]: r["sig"]
        for r in DD.minhash_signatures(
            docs,
            text_col="text",
            id_col="doc_id",
            shingles=DD._shingle_hashes(docs, "text", "doc_id", 3),
        ).collect()
    }
    assert base == via_map == via_frame


def test_minhash_estimator_calibration(spark):
    """Signature-component match fraction must be an unbiased estimator
    of true Jaccard — the property the banding recall guarantee rests
    on. Regression for the (a*x+b) mod 2^61-1 family over a 2^31 domain,
    whose at-most-one-wrap "permutations" were dominated by the smallest
    shingle hash: 32 correlated components, est 0.09 at true J 0.97."""
    rng = np.random.default_rng(11)

    def mk(n, words):
        return " ".join(f"w{v}" for v in rng.choice(words, n))

    base_words = np.arange(2000)
    pairs = []
    for i in range(30):
        a = mk(400, base_words)
        # perturb a controlled fraction of words -> a spread of true J
        wa = a.split(" ")
        n_swap = int(len(wa) * (i / 40))
        idx = rng.choice(len(wa), n_swap, replace=False)
        wb = list(wa)
        for j in idx:
            wb[j] = f"x{j}"
        pairs.append((2 * i, a, 2 * i + 1, " ".join(wb)))

    def shingle_set(t, k=3):
        w = t.split(" ")
        return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}

    rows = [(p[0], p[1]) for p in pairs] + [(p[2], p[3]) for p in pairs]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sig = {r["doc_id"]: np.array(r["sig"])
           for r in DD.minhash_signatures(df, num_hashes=128).collect()}
    errs = []
    for ia, ta, ib, tb in pairs:
        sa, sb = shingle_set(ta), shingle_set(tb)
        true_j = len(sa & sb) / len(sa | sb)
        est = float((sig[ia] == sig[ib]).mean())
        sd = max((true_j * (1 - true_j) / 128) ** 0.5, 1e-9)
        errs.append((est - true_j) / sd)
        # each estimate within 5 sd of truth (binomial, n=128)
        assert abs(est - true_j) <= max(5 * sd, 0.04), (true_j, est)
    # and unbiased in aggregate: mean standardized error near 0
    assert abs(float(np.mean(errs))) < 1.0


def test_simhash_hamming(docs):
    fps = DD.simhash(docs, text_col="text", id_col="doc_id")
    vals = {r["doc_id"]: r["simhash"] for r in fps.collect()}
    assert vals[1] == vals[2]  # identical text -> identical fingerprint
    ham_near = bin(vals[1] ^ vals[3]).count("1")
    ham_far = bin(vals[1] ^ vals[4]).count("1")
    assert ham_near < ham_far  # near-dup closer than unrelated


def test_brute_force_topk_matches_numpy(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(30, 8)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]], "l") for i in range(30)]
    em = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    q = em.filter(F.col("vec_id") < 3)
    got = SIM.brute_force_topk(em, q, k=4).collect()

    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    for qi in range(3):
        order = [
            j for j in np.argsort(-sims[qi], kind="stable") if j != qi
        ][:4]
        mine = [r["neighbor_id"] for r in got if r["query_id"] == qi]
        mine = [x for _, x in sorted(
            [(r["rank"], r["neighbor_id"]) for r in got if r["query_id"] == qi]
        )]
        assert mine == order, (qi, mine, order)


def test_lsh_topk_recall(spark):
    # clustered corpus: LSH recall is only meaningful when neighbors are
    # actually close (uniform random points defeat any locality hash)
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(6, 16)) * 4.0
    vecs = np.vstack(
        [centers[i % 6] + rng.normal(size=16) * 0.3 for i in range(60)]
    ).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]], "l") for i in range(60)]
    em = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    q = em.filter(F.col("vec_id") < 5)
    exact = SIM.brute_force_topk(em, q, k=3).collect()
    approx = SIM.lsh_topk(em, q, k=3).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    # LSH is approximate: require recall >= 50% on this tiny set, and
    # every returned cos_sim must be exact (scoring is not approximated)
    assert len(exact_set & approx_set) >= len(exact_set) // 2
    for r in approx:
        v = vecs[r["query_id"]] / np.linalg.norm(vecs[r["query_id"]])
        w = vecs[r["neighbor_id"]] / np.linalg.norm(vecs[r["neighbor_id"]])
        assert r["cos_sim"] == pytest.approx(float(v @ w), abs=1e-5)


def test_text_profile_features(spark):
    d = spark.createDataFrame(
        [
            (1, "The cat and the dog are in the house with all of them."),
            (2, "Der Hund und die Katze sind mit der Maus in einem Haus."),
            (3, ""),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in TX.text_profile(d).collect()}
    assert out[1]["lang_pred"] == "en"
    assert out[2]["lang_pred"] == "de"
    assert out[1]["n_tokens"] == 13
    assert out[3]["n_tokens"] == 0 and out[3]["lang_pred"] == "und"
    assert out[1]["fingerprint"] != out[2]["fingerprint"]


def test_encoders_roundtrip(spark):
    df = spark.createDataFrame(
        [(x,) for x in ["b", "a", "a", "c", "a", "b", None]], ["cat"]
    )
    vocab = fit_vocabulary(df, "cat")
    v = {r["value"]: r["index"] for r in vocab.collect()}
    assert v == {"a": 0, "b": 1, "c": 2}  # freq desc, value asc

    enc = ordinal_encode(df, "cat", vocab).collect()
    assert {r["cat"]: r["cat_ord"] for r in enc if r["cat"]} == {"a": 0, "b": 1, "c": 2}
    assert [r["cat_ord"] for r in enc if r["cat"] is None] == [-1]

    b = binary_encode(df, "cat", vocab, n_bits=2).collect()
    codes = {r["cat"]: (r["cat_bin_0"], r["cat_bin_1"]) for r in b if r["cat"]}
    assert codes == {"a": (0, 1), "b": (1, 0), "c": (1, 1)}
    assert [(r["cat_bin_0"], r["cat_bin_1"]) for r in b if r["cat"] is None] == [(0, 0)]


def test_suite_drift_path(spark, tokens_df, dim_df):
    from autoprepad_spark.operators.drift import ntok_histogram
    from autoprepad_spark.plans.suite import ValidationSuite
    from autoprepad_spark import datagen as G

    baseline = ntok_histogram(tokens_df)
    # drifted current: shift web's n_tok distribution
    drifted = G.generate_tokens(
        spark, 40_000, seed=42, n_parts=8, drift_source="web", drift_shift=1.0
    )
    res = ValidationSuite().run(drifted, dim=dim_df, baseline_hist=baseline)
    d = {r["source"]: r for r in res.drift.collect()}
    assert d["web"]["status"] == "fail" and d["web"]["psi"] > 0.2
    ok_sources = [s for s, r in d.items() if s != "web" and r["status"] == "pass"]
    assert len(ok_sources) >= 5  # undrifted sources pass


def test_exact_duplicates_bounded_exemplars(spark):
    """dup_count is exact while doc_ids is a bounded deterministic
    exemplar set (the K smallest ids) — per-group aggregation state must
    not grow with a pathological group (round-3 scale fix)."""
    rows = [(i, "same text every time") for i in range(100)]
    rows += [(1000, "another unique document here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    groups = DD.exact_duplicates(df, "text", "doc_id", max_exemplars=5).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["dup_count"] == 100
    assert g["doc_ids"] == [0, 1, 2, 3, 4]  # 5 smallest, sorted


def test_minhash_bucket_cap_kills_degenerate_bucket(spark):
    """A boilerplate-heavy corpus (10k identical docs) must NOT produce a
    quadratic candidate set: the oversized band buckets are dropped while
    genuinely-near-dup pairs in small buckets survive."""
    boiler = "this exact boilerplate footer text appears on every single page of the site"
    rows = [(i, boiler) for i in range(10_000)]
    # a genuine near-dup pair: 30 shared words + one trailing extra word
    # -> shingle J = 28/29 ~= 0.97, P(no band matches) ~= 3e-8 under a
    # CORRECT minhash family (the old correlated family passed even at
    # J=0.5, which is how a weaker fixture once slipped through here)
    article = " ".join(f"word{i}" for i in range(30))
    rows += [(20_000, article), (20_001, article + " extra")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sigs = DD.minhash_signatures(df, text_col="text", id_col="doc_id").cache()
    pairs = DD.minhash_candidates(
        sigs, id_col="doc_id", num_hashes=32, max_bucket_size=100
    ).collect()
    sigs.unpersist()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # the 10k-clone cluster would contribute ~50M pairs without the cap
    assert len(got) < 100
    assert (20_000, 20_001) in got  # small-bucket near-dups survive
    assert not any(a < 10_000 and b < 10_000 for a, b in got)


def test_verify_pairs_strategy_independent(docs):
    """verify_pairs_jaccard results are identical whether the candidate
    side is broadcast-hinted or left to AQE (the OOM-resilient default)."""
    pairs = docs.alias("a").crossJoin(docs.alias("b")).select(
        F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
    ).filter(F.col("id_a") < F.col("id_b"))
    kw = dict(text_col="text", id_col="doc_id", threshold=0.1)
    auto = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in DD.verify_pairs_jaccard(docs, pairs, **kw).collect()
    }
    hinted = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in DD.verify_pairs_jaccard(
            docs, pairs, broadcast_pairs=True, **kw
        ).collect()
    }
    assert auto == hinted and len(auto) > 0


def test_connected_components_matches_union_find(spark):
    """Star-contraction CC equals a driver-side union-find on graphs that
    stress both density (random) and diameter (a path)."""
    import random

    def ref_cc(edges, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in nodes}

    rng = random.Random(7)
    cases = [
        [(rng.randrange(80), rng.randrange(80)) for _ in range(120)],
        [(i, i + 1) for i in range(30)],  # path: worst-case diameter
    ]
    for edges in cases:
        edges = [(a, b) for a, b in edges if a != b]
        nodes = sorted({x for e in edges for x in e})
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r["node"]: r["component"]
            for r in DD.connected_components(df).collect()
        }
        assert got == ref_cc(edges, nodes)


def test_dup_cluster_sizes(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9), (10, 11), (11, 12), (12, 13)],
        "id_a long, id_b long",
    )
    got = {r["cluster"]: r["n_docs"] for r in DD.dup_cluster_sizes(df).collect()}
    assert got == {1: 3, 7: 2, 10: 4}


def test_keep_one_per_cluster(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "id_a long, id_b long"
    )
    kept = sorted(
        r["doc_id"] for r in DD.keep_one_per_cluster(docs, pairs).collect()
    )
    # clusters {1,2,3} -> keep 1; {7,9} -> keep 7; singletons pass through
    assert kept == [0, 1, 4, 5, 6, 7, 8]


def test_repetition_profile(spark):
    from autoprepad_spark.operators.text import repetition_profile

    docs = spark.createDataFrame(
        [
            (1, "accept cookies\nreal content here\naccept cookies\nmore text"),
            (2, "one\ntwo\nthree\nfour"),
            (3, "spam spam spam spam spam spam"),
            (4, "short"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_profile(docs).collect()}
    assert got[1]["dup_line_frac"] == 0.25      # 1 repeat of 4 lines
    assert got[2]["dup_line_frac"] == 0.0
    assert got[2]["top_bigram_frac"] == round(1 / 3, 6)  # all bigrams distinct
    assert got[3]["top_bigram_frac"] == 1.0     # "spam spam" is every bigram
    assert got[4]["dup_line_frac"] == 0.0 and got[4]["top_bigram_frac"] == 0.0


def test_ngram_repetition_signals_match_python_oracle(spark):
    """top_ngram_fraction / dup_ngram_char_fraction vs a direct Python
    recount on a seeded corpus including engineered repetition."""
    import random

    from autoprepad_spark.operators.text import (
        dup_ngram_char_fraction,
        top_ngram_fraction,
    )

    rnd = random.Random(11)
    vocab = [f"t{i}" for i in range(12)]
    rows = [(i, " ".join(rnd.choice(vocab) for _ in range(rnd.randrange(3, 40))))
            for i in range(30)]
    rows.append((100, "a b c d e f a b c d e f a b c d e f"))  # heavy 5-gram dups
    rows.append((101, "x y"))                                   # shorter than n
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def py_top(text, n):
        ws = text.lower().split()
        if len(ws) <= n:
            return 0.0
        grams = [" ".join(ws[i:i + n]) for i in range(max(len(ws) - n + 1, 1))]
        best = max(grams.count(g) for g in set(grams))
        return round(best / len(grams), 6)

    def py_dup_chars(text, n):
        ws = text.lower().split()
        if len(ws) <= n:
            return 0.0
        grams = [" ".join(ws[i:i + n]) for i in range(max(len(ws) - n + 1, 1))]
        dup = sum((grams.count(g) - 1) * len(g) for g in set(grams)
                  if grams.count(g) > 1)
        return round(min(dup / max(len(" ".join(ws)), 1), 1.0), 6)

    out = df.select(
        "doc_id", "text",
        *[F.round(top_ngram_fraction("text", n), 6).alias(f"top{n}")
          for n in (2, 3, 4)],
        *[F.round(dup_ngram_char_fraction("text", n), 6).alias(f"dup{n}")
          for n in (5, 10)],
    ).collect()
    for r in out:
        for n in (2, 3, 4):
            assert r[f"top{n}"] == py_top(r["text"], n), (r["doc_id"], n)
        for n in (5, 10):
            assert r[f"dup{n}"] == py_dup_chars(r["text"], n), (r["doc_id"], n)
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[100]["dup5"] > 0.5      # engineered repetition is caught
    assert by_id[101]["dup5"] == 0.0


def test_shingle_hash_domain_equivalent_to_string_domain(spark):
    """word_shingle_hashes (production int path) must induce the same
    set structure as the readable string-domain word_shingles: equal
    per-doc distinct-shingle counts and equal pairwise Jaccard, for
    several k including the n < k degenerate case."""
    rows = [
        (1, "a b c d e f g"),
        (2, "a b c d e f h"),          # near dup of 1
        (3, "a b c d e f g"),          # exact dup of 1
        (4, "x y z"),                   # n == k boundary for k=3
        (5, "short"),                   # n < k -> whole-doc shingle
        (6, "p q p q p q p q"),         # repeated shingles -> distinct matters
        (7, ""),                        # empty text
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for k in (2, 3, 5):
        out = df.select(
            "doc_id",
            F.size(DD.word_shingles("text", k)).alias("n_str"),
            F.size(DD.word_shingle_hashes("text", k)).alias("n_int"),
        ).collect()
        for r in out:
            assert r["n_str"] == r["n_int"], (r["doc_id"], k)

    def jacc(col):
        sh = df.select(
            F.col("doc_id").alias("_id"), F.explode(col).alias("_h")
        )
        a, b = sh.alias("a"), sh.alias("b")
        inter = (
            a.join(b, (F.col("a._h") == F.col("b._h"))
                   & (F.col("a._id") < F.col("b._id")))
            .groupBy(F.col("a._id").alias("i"), F.col("b._id").alias("j"))
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
        sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n"))
        return {
            (r["i"], r["j"]): r["n_inter"]
            for r in inter.collect()
        }, {r["_id"]: r["n"] for r in sizes.collect()}

    i_str, s_str = jacc(DD.word_shingles("text", 3))
    i_int, s_int = jacc(
        DD.word_shingle_hashes("text", 3).cast("array<string>")
    )
    assert s_str == s_int
    assert i_str == i_int
