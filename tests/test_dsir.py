"""DSIR (hashed-ngram importance resampling) — exact Python oracle for
the engine-portable md5 feature family, structural + determinism checks
for the production hash64 family, Gumbel top-k selection semantics, a
statistical enrichment check, and physical-plan shape."""

from __future__ import annotations

import contextlib
import hashlib
import io
import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from autoprepad_spark.operators import dsir

BUCKETS = 503  # prime, small enough to collide — exercises the hash mod


# ---------------------------------------------------------------- oracle
def _norm(t: str) -> str:
    return re.sub(r"\s+", " ", t.lower()).strip()


def _md5_bucket(g: str, m: int = BUCKETS) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % m


def _grams_md5(t: str, m: int = BUCKETS, bigrams: bool = True) -> list[int]:
    ws = [w for w in _norm(t).split(" ") if w]
    out = [_md5_bucket(w, m) for w in ws]
    if bigrams:
        out += [_md5_bucket(ws[i] + " " + ws[i + 1], m) for i in range(len(ws) - 1)]
    return out


def _lam(target_texts, raw_texts, m=BUCKETS, alpha=1.0) -> list[float]:
    t = Counter(b for x in target_texts for b in _grams_md5(x, m))
    q = Counter(b for x in raw_texts for b in _grams_md5(x, m))
    t_tot = float(sum(t.values())) + alpha * m
    q_tot = float(sum(q.values())) + alpha * m
    return [
        math.log((t.get(b, 0) + alpha) / t_tot)
        - math.log((q.get(b, 0) + alpha) / q_tot)
        for b in range(m)
    ]


def _logw(text: str, lam: list[float]) -> float:
    acc = 0.0
    for b in _grams_md5(text, len(lam)):
        acc += lam[b]  # same left-fold order as F.aggregate
    return acc


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# --------------------------------------------------------------- fixtures
_SCI = (
    "the quantum field theory of gauge bosons",
    "spectral measurements of stellar plasma emission",
    "protein folding dynamics under thermal stress",
    "numerical integration of stiff differential equations",
    "bayesian inference over latent variable models",
)
_WEB = (
    "click here to win amazing prizes today",
    "top ten celebrity diet tricks revealed",
    "buy cheap watches free shipping limited offer",
    "you will not believe what happened next",
    "subscribe now for exclusive deals and coupons",
)


def _mk_docs(spark, texts_by_kind, reps):
    rows = []
    i = 0
    for kind, texts in texts_by_kind:
        for r in range(reps):
            for t in texts:
                rows.append((f"d{i:05d}", f"{t} variant {r}", kind))
                i += 1
    return spark.createDataFrame(rows, "doc_id string, text string, kind string")


@pytest.fixture(scope="module")
def corpora(spark):
    target = _mk_docs(spark, [("sci", _SCI)], 4)
    raw = _mk_docs(spark, [("sci", _SCI), ("web", _WEB)], 20).cache()
    raw.count()
    return target, raw


# ------------------------------------------------------------------ tests
def test_md5_grams_match_hashlib_oracle(spark, corpora):
    _, raw = corpora
    got = raw.select(
        "text",
        dsir.hashed_ngram_buckets("text", buckets=BUCKETS, method="md5").alias("g"),
    ).collect()
    assert got, "empty fixture"
    for row in got:
        assert row["g"] == _grams_md5(row["text"]), row["text"]


def test_fit_counts_match_counter_oracle(spark, corpora):
    target, _ = corpora
    fit = dsir.fit_hashed_ngrams(target, buckets=BUCKETS, method="md5")
    got = {r["bucket"]: r["cnt"] for r in fit.collect()}
    texts = [r["text"] for r in target.collect()]
    want = Counter(b for x in texts for b in _grams_md5(x))
    assert got == dict(want)


def test_log_weights_exact_vs_python(spark, corpora):
    target, raw = corpora
    t_fit = dsir.fit_hashed_ngrams(target, buckets=BUCKETS, method="md5")
    q_fit = dsir.fit_hashed_ngrams(raw, buckets=BUCKETS, method="md5")
    scored = dsir.dsir_log_weights(
        raw, t_fit, q_fit, buckets=BUCKETS, method="md5"
    ).collect()
    lam = _lam(
        [r["text"] for r in target.collect()], [r["text"] for r in raw.collect()]
    )
    for row in scored:
        # identical left-fold order over identical doubles -> bit-exact
        assert row["dsir_logw"] == _logw(row["text"], lam), row["text"]


def test_weights_rank_target_like_docs_higher(spark, corpora):
    target, raw = corpora
    t_fit = dsir.fit_hashed_ngrams(target, buckets=BUCKETS, method="md5")
    q_fit = dsir.fit_hashed_ngrams(raw, buckets=BUCKETS, method="md5")
    rows = dsir.dsir_log_weights(
        raw, t_fit, q_fit, buckets=BUCKETS, method="md5"
    ).collect()
    sci = [r["dsir_logw"] for r in rows if r["kind"] == "sci"]
    web = [r["dsir_logw"] for r in rows if r["kind"] == "web"]
    assert min(sci) > max(web)  # fully separated on this fixture


def test_gumbel_select_matches_score_topk_and_is_deterministic(spark, corpora):
    target, raw = corpora
    t_fit = dsir.fit_hashed_ngrams(target, buckets=BUCKETS, method="md5")
    q_fit = dsir.fit_hashed_ngrams(raw, buckets=BUCKETS, method="md5")
    scored = dsir.dsir_log_weights(raw, t_fit, q_fit, buckets=BUCKETS, method="md5")
    k = 30
    kept = {r["doc_id"] for r in dsir.dsir_select(scored, k).collect()}
    assert len(kept) == k
    # the selected set IS the top-k of (logw + gumbel) computed row-wise
    full = scored.select(
        "doc_id", (F.col("dsir_logw") + dsir.gumbel_key("doc_id")).alias("s")
    ).collect()
    want = {r["doc_id"] for r in sorted(full, key=lambda r: (-r["s"], r["doc_id"]))[:k]}
    assert kept == want
    # parallelism independence
    kept1 = {r["doc_id"] for r in dsir.dsir_select(scored.repartition(1), k).collect()}
    kept7 = {r["doc_id"] for r in dsir.dsir_select(scored.repartition(7), k).collect()}
    assert kept1 == kept == kept7


def test_gumbel_key_matches_python_formula(spark):
    df = spark.createDataFrame([("a",), ("b",), ("zz",)], "doc_id string")
    got = {r["doc_id"]: r["g"] for r in df.select(
        "doc_id", dsir.gumbel_key("doc_id", salt="s1").alias("g")
    ).collect()}
    for key, g in got.items():
        h = int(hashlib.md5((key + "s1").encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 2**32
        assert g == pytest.approx(-math.log(-math.log(u)), rel=1e-12)


def test_selection_enriches_target_kind(spark, corpora):
    """The point of DSIR: resampling overrepresents target-like docs."""
    target, raw = corpora
    t_fit = dsir.fit_hashed_ngrams(target, buckets=BUCKETS)
    q_fit = dsir.fit_hashed_ngrams(raw, buckets=BUCKETS)
    scored = dsir.dsir_log_weights(raw, t_fit, q_fit, buckets=BUCKETS)
    n_raw = raw.count()
    kept = dsir.dsir_select(scored, n_raw // 4).collect()
    sci_frac = sum(1 for r in kept if r["kind"] == "sci") / len(kept)
    assert sci_frac > 0.9  # raw mix is 0.5


def test_hash64_family_structure_and_determinism(spark, corpora):
    _, raw = corpora
    both = raw.select(
        dsir.hashed_ngram_buckets("text", buckets=BUCKETS, method="hash64").alias("a"),
        dsir.hashed_ngram_buckets("text", buckets=BUCKETS, method="md5").alias("b"),
    ).collect()
    for r in both:
        assert len(r["a"]) == len(r["b"])  # same gram multiset size
        assert all(0 <= b < BUCKETS for b in r["a"])
    f1 = dsir.fit_hashed_ngrams(raw.repartition(1), buckets=BUCKETS)
    f8 = dsir.fit_hashed_ngrams(raw.repartition(8), buckets=BUCKETS)
    assert sorted(map(tuple, f1.collect())) == sorted(map(tuple, f8.collect()))


def test_empty_null_and_tiny_docs(spark, corpora):
    target, raw = corpora
    t_fit = dsir.fit_hashed_ngrams(target, buckets=BUCKETS, method="md5")
    q_fit = dsir.fit_hashed_ngrams(raw, buckets=BUCKETS, method="md5")
    edge = spark.createDataFrame(
        [("e0", ""), ("e1", "   "), ("e2", None), ("e3", "one"), ("e4", "two words")],
        "doc_id string, text string",
    )
    rows = {r["doc_id"]: r for r in dsir.dsir_log_weights(
        edge, t_fit, q_fit, buckets=BUCKETS, method="md5"
    ).collect()}
    for d in ("e0", "e1", "e2"):
        assert rows[d]["dsir_logw"] == 0.0  # no grams, no evidence
    assert rows["e3"]["dsir_logw"] != 0.0
    lam = _lam(
        [r["text"] for r in target.collect()], [r["text"] for r in raw.collect()]
    )
    assert rows["e4"]["dsir_logw"] == _logw("two words", lam)
    # k larger than the frame keeps everything
    assert dsir.dsir_select(rows_df := dsir.dsir_log_weights(
        edge, t_fit, q_fit, buckets=BUCKETS, method="md5"
    ), 100).count() == 5


def test_plan_shapes(spark, corpora, tmp_path):
    target, raw = corpora
    p = str(tmp_path / "raw.parquet")
    raw.write.mode("overwrite").parquet(p)
    on_disk = spark.read.parquet(p)
    t_fit = dsir.fit_hashed_ngrams(target, buckets=BUCKETS)
    q_fit = dsir.fit_hashed_ngrams(on_disk, buckets=BUCKETS)
    scored = dsir.dsir_log_weights(on_disk, t_fit, q_fit, buckets=BUCKETS)
    plan = _plan_of(scored)
    # pure scan-level projection: no shuffle, no Python anywhere
    assert "Exchange" not in plan
    assert "Python" not in plan
    sel_plan = _plan_of(dsir.dsir_select(scored, 10))
    assert "TakeOrderedAndProject" in sel_plan  # no global sort materializes
    fit_plan = _plan_of(q_fit)
    assert "partial_count" in fit_plan  # map-side combine bounds the shuffle
    assert "Python" not in fit_plan


def test_fit_matches_duckdb_oracle(spark, corpora, tmp_path):
    """Cross-engine proof of the md5 family: DuckDB recomputes the fit
    frame from the same parquet, row-identical."""
    import duckdb

    _, raw = corpora
    p = str(tmp_path / "docs.parquet")
    raw.select("doc_id", "text").write.mode("overwrite").parquet(p)
    got = sorted(
        (r["bucket"], r["cnt"])
        for r in dsir.fit_hashed_ngrams(
            spark.read.parquet(p), buckets=BUCKETS, method="md5"
        ).collect()
    )
    sql = dsir.fit_oracle_sql(
        f"SELECT doc_id, text FROM read_parquet('{p}/*.parquet')",
        buckets=BUCKETS,
    )
    want = sorted(duckdb.connect().execute(sql).fetchall())
    assert got == want


def test_fit_metadata_mismatch_raises(spark, corpora):
    """Fits stamp (buckets, bigrams, method) into the bucket column's
    schema metadata; dsir_log_weights must refuse a fit built with a
    different feature space (ADVICE r3: a silent mismatch — fit md5,
    score hash64 — yields meaningless weights)."""
    target, raw = corpora
    t_fit = dsir.fit_hashed_ngrams(target, buckets=BUCKETS, method="md5")
    q_fit = dsir.fit_hashed_ngrams(raw, buckets=BUCKETS, method="md5")
    # method mismatch (the easy silent one: md5 fit, default hash64 score)
    with pytest.raises(ValueError, match="feature spaces must match"):
        dsir.dsir_log_weights(raw, t_fit, q_fit, buckets=BUCKETS, method="hash64")
    # buckets mismatch
    with pytest.raises(ValueError, match="feature spaces must match"):
        dsir.dsir_log_weights(raw, t_fit, q_fit, buckets=BUCKETS + 2, method="md5")
    # bigrams mismatch
    with pytest.raises(ValueError, match="feature spaces must match"):
        dsir.dsir_log_weights(
            raw, t_fit, q_fit, buckets=BUCKETS, method="md5", bigrams=False
        )
    # agreement passes
    dsir.dsir_log_weights(raw, t_fit, q_fit, buckets=BUCKETS, method="md5")


def test_fit_metadata_survives_merge_and_parquet(spark, corpora, tmp_path):
    """The metadata stamp must ride the mergeable-profile contract:
    groupBy-sum shard merges and parquet round-trips keep it, so the
    guard still fires on fits read back from disk."""
    target, raw = corpora
    a = dsir.fit_hashed_ngrams(target, buckets=BUCKETS, method="md5")
    b = dsir.fit_hashed_ngrams(raw, buckets=BUCKETS, method="md5")
    merged = (
        a.unionByName(b).groupBy("bucket").agg(F.sum("cnt").alias("cnt"))
    )
    assert merged.schema["bucket"].metadata["dsir_method"] == "md5"
    p = str(tmp_path / "fit.parquet")
    merged.write.mode("overwrite").parquet(p)
    back = spark.read.parquet(p)
    assert back.schema["bucket"].metadata["dsir_buckets"] == BUCKETS
    with pytest.raises(ValueError, match="feature spaces must match"):
        dsir.dsir_log_weights(raw, back, back, buckets=BUCKETS, method="hash64")


def test_vertical_tab_oracle_parity(spark, tmp_path):
    """ADVICE r3: Java's \\s includes \\x0b, RE2's does not — the oracle
    now splits on the explicit class [ \\t\\n\\x0b\\f\\r]+ so texts
    containing vertical tab tokenize identically in both engines."""
    import duckdb

    rows = [
        (0, "alpha\x0bbeta gamma"),       # \v must split words like Spark does
        (1, "tab\tand\x0b\x0bdouble vt"),
        (2, "plain text no vt"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    p = str(tmp_path / "vt.parquet")
    df.write.mode("overwrite").parquet(p)
    got = sorted(
        (r["bucket"], r["cnt"])
        for r in dsir.fit_hashed_ngrams(
            spark.read.parquet(p), buckets=BUCKETS, method="md5"
        ).collect()
    )
    sql = dsir.fit_oracle_sql(
        f"SELECT doc_id, text FROM read_parquet('{p}/*.parquet')",
        buckets=BUCKETS,
    )
    want = sorted(duckdb.connect().execute(sql).fetchall())
    assert got == want
    # sanity: \v really did split — 'alpha' and 'beta' are separate grams
    n_grams = sum(c for _, c in got)
    assert n_grams == (3 + 2) + (4 + 3) + (4 + 3)  # uni + bi per doc
