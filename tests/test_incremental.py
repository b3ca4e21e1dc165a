"""Incremental shard-vs-history dedup: oracle + contract tests.

Oracle discipline: the exact pass is checked against DuckDB (hash
equality is re-expressed as normalized-text equality — DuckDB cannot
compute xxhash64, but two texts collide on content_hash iff their
normalized forms are equal, up to 2^-64); the near-dup pass is checked
against a Python true-Jaccard oracle (every true J>=0.9 shard-vs-history
pair must be dropped — the recall proof; est_jaccard must sit within
the MinHash estimator's tolerance of true J).
"""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from autoprepad_spark.operators import incremental as INC


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.strip().lower())


def _shingles(s: str, k: int = 3) -> set[str]:
    w = _norm(s).split(" ")
    if len(w) < k:
        return {" ".join(w)}
    return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}


def _jac(a: str, b: str) -> float:
    sa, sb = _shingles(a), _shingles(b)
    return len(sa & sb) / len(sa | sb)


def _mk_text(i: int, n: int = 40) -> str:
    import numpy as np

    rng = np.random.default_rng([7, i])
    return " ".join(f"w{v}" for v in rng.integers(0, 500, n))


HIST = [(i, _mk_text(i)) for i in range(100)]
SHARD = (
    [(1000, HIST[3][1])]                                # exact dup of hist 3
    + [(1001, "  " + HIST[7][1].upper() + " ")]          # normalized-exact dup
    + [(1002, _mk_text(5) + " tail")]                    # near dup of hist 5
    + [(1003, _mk_text(11)[:-6] + " x y z")]             # near-ish of hist 11
    + [(1004 + j, _mk_text(10_000 + j)) for j in range(60)]  # fresh
)


@pytest.fixture(scope="module")
def frames(spark):
    hist = spark.createDataFrame(HIST, ["doc_id", "text"])
    shard = spark.createDataFrame(SHARD, ["doc_id", "text"])
    index = INC.build_dedup_index(hist).cache()
    index.count()
    return hist, shard, index


def test_exact_pass_matches_duckdb_oracle(spark, frames):
    hist, shard, index = frames
    _, dropped = INC.dedup_against_index(shard, index, threshold=0.9)
    got = sorted(
        r["doc_id"] for r in dropped.filter("reason = 'exact'").collect()
    )
    con = duckdb.connect()
    con.register("hist", hist.toPandas())
    con.register("shard", shard.toPandas())
    want = sorted(
        r[0]
        for r in con.execute(
            """
            SELECT DISTINCT s.doc_id FROM shard s JOIN hist h
            ON regexp_replace(trim(lower(s.text)), '\\s+', ' ', 'g')
             = regexp_replace(trim(lower(h.text)), '\\s+', ' ', 'g')
            """
        ).fetchall()
    )
    assert got == want == [1000, 1001]


def test_near_pass_recall_and_estimator_tolerance(spark, frames):
    hist, shard, index = frames
    kept, dropped = INC.dedup_against_index(shard, index, threshold=0.8)
    near = {r["doc_id"]: r for r in dropped.filter("reason = 'near'").collect()}
    # python truth: shard docs (not exact dups) with true J >= 0.9 vs any
    # historical doc MUST be dropped (recall at the operating point:
    # est threshold 0.8 on 32 hashes catches true 0.9 with huge margin)
    truth = {}
    for sid, stext in SHARD[2:]:
        best = max(((hid, _jac(stext, htext)) for hid, htext in HIST), key=lambda t: t[1])
        if best[1] >= 0.9:
            truth[sid] = best
    assert truth, "fixture must engineer at least one true near-dup"
    for sid, (hid, true_j) in truth.items():
        assert sid in near, f"true near-dup {sid} (J={true_j:.3f}) not dropped"
        assert near[sid]["matched_id"] == hid
        # MinHash estimator tolerance: sd = sqrt(J(1-J)/32); allow 4 sd
        sd = (true_j * (1 - true_j) / 32) ** 0.5
        assert abs(near[sid]["est_jaccard"] - true_j) <= max(4 * sd, 0.13)
    # precision guard: nothing with true J < 0.5 may be dropped as near
    for sid in near:
        stext = dict(SHARD)[sid]
        true_best = max(_jac(stext, h) for _, h in HIST)
        assert true_best >= 0.5, (sid, true_best)
    # kept + dropped partition the shard
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    dropped_ids = {r["doc_id"] for r in dropped.select("doc_id").collect()}
    assert kept_ids | dropped_ids == {i for i, _ in SHARD}
    assert not kept_ids & dropped_ids


def test_index_update_roundtrip_equals_rebuild(spark, frames):
    """append_to_index(index, kept) must equal build_dedup_index over
    history + kept docs — the zero-recompute update is exact."""
    hist, shard, index = frames
    kept, _ = INC.dedup_against_index(shard, index, threshold=0.8)
    updated = INC.append_to_index(index, kept)
    rebuilt = INC.build_dedup_index(
        hist.unionByName(kept.select("doc_id", "text"))
    )
    a = sorted(updated.collect(), key=lambda r: r["doc_id"])
    b = sorted(rebuilt.collect(), key=lambda r: r["doc_id"])
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def _collected(kept, dropped):
    return (
        sorted(r["doc_id"] for r in kept.select("doc_id").collect()),
        sorted(tuple(r) for r in dropped.collect()),
    )


def test_prefilter_history_identical_results(spark, frames):
    """The shard-driving-side prefilter (broadcast semi-join of the
    history against shard keys) must not change ANY output row."""
    hist, shard, index = frames
    with_pf = _collected(
        *INC.dedup_against_index(shard, index, threshold=0.8, prefilter_history=True)
    )
    without = _collected(
        *INC.dedup_against_index(shard, index, threshold=0.8, prefilter_history=False)
    )
    assert with_pf == without


def test_prefilter_preserves_bucket_cap_semantics(spark):
    """Bucket-cap counts are computed over surviving buckets only under
    the prefilter; they must still reflect FULL history bucket sizes —
    a shard NEAR-dup landing in an oversized boilerplate bucket stays
    kept (bucket dropped) with and without the prefilter."""
    hist = spark.createDataFrame(
        [(i, "the same boilerplate page " * 10) for i in range(2_000)],
        ["doc_id", "text"],
    )
    index = INC.build_dedup_index(hist)
    shard = spark.createDataFrame(
        # near variant: not an exact dup, shares most shingles
        [(99_999, "the same boilerplate page " * 10 + "extra words here")],
        ["doc_id", "text"],
    )
    outs = [
        _collected(
            *INC.dedup_against_index(
                shard, index, threshold=0.8, prefilter_history=pf
            )
        )
        for pf in (True, False)
    ]
    assert outs[0] == outs[1]
    kept_ids, dropped_rows = outs[0]
    assert kept_ids == [99_999] and dropped_rows == []


def _shard_frames(spark):
    """Three shards of a numeric table with nulls and skewed domains."""
    import numpy as np

    rng = np.random.default_rng(31)
    rows = [
        (
            int(i),
            int(rng.integers(0, 40)) if i % 7 else None,
            float(rng.integers(-5, 6)) if i % 11 else None,
        )
        for i in range(3_000)
    ]
    full = spark.createDataFrame(rows, ["doc_id", "a", "b"])
    shards = [full.filter(F.col("doc_id") % 3 == k) for k in range(3)]
    return full, shards


def test_merged_shard_profiles_fit_equals_batch_fit(spark):
    """fit_from_profile over merged shard profiles must equal
    fit_robust_multi over the concatenated data EXACTLY (same
    RobustStats dataclass values) — the no-rescan fit is not an
    approximation."""
    from autoprepad_spark.functions.stats import fit_robust_multi

    full, shards = _shard_frames(spark)
    merged = INC.merge_profiles(
        *[INC.shard_profile(s, ["a", "b"]) for s in shards]
    )
    got = INC.fit_from_profile(merged)
    want = fit_robust_multi(full, ["a", "b"])
    assert got == want


def test_profile_counts_match_duckdb(spark):
    full, shards = _shard_frames(spark)
    merged = INC.merge_profiles(
        *[INC.shard_profile(s, ["a", "b"]) for s in shards]
    )
    got = {
        r["col"]: (r["n_rows"], r["n_null"], round(r["null_rate"], 12))
        for r in INC.profile_counts(merged).collect()
    }
    con = duckdb.connect()
    con.register("t", full.toPandas())
    want = {
        c: (n_rows, n_null, round(n_null / n_rows, 12))
        for c, n_rows, n_null in con.execute(
            """
            SELECT 'a', count(*), count(*) - count(a) FROM t
            UNION ALL SELECT 'b', count(*), count(*) - count(b) FROM t
            """
        ).fetchall()
    }
    assert got == want


def test_quantize_matches_duckdb_and_bounds_domain(spark):
    """Quantized continuous values land on bucket midpoints (bounded
    domain: <= range/width cells) with DuckDB-identical arithmetic."""
    import numpy as np

    rng = np.random.default_rng(5)
    vals = [float(v) for v in rng.normal(10.0, 3.0, 5_000)]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    got = sorted(
        (r["q"], r["n"])
        for r in df.select(INC.quantize("x", 0.5).alias("q"))
        .groupBy("q")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame({"x": vals}))
    want = sorted(
        con.execute(
            "SELECT (floor(x / 0.5) + 0.5) * 0.5 AS q, count(*) FROM t GROUP BY 1"
        ).fetchall()
    )
    assert got == want
    assert len(got) < 60  # ~12-sigma range / 0.5 width


def test_hll_merge_equals_single_pass(spark):
    """Register-wise max over shard sketches must reproduce the
    whole-corpus sketch bit-for-bit (estimate included)."""
    from autoprepad_spark.functions.sketches import (
        hll_distinct,
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    full, shards = _shard_frames(spark)
    merged = hll_merge(*[hll_registers(s, ["doc_id", "a"]) for s in shards])
    got = sorted(
        tuple(r) for r in hll_estimate(merged).collect()
    )
    want = sorted(tuple(r) for r in hll_distinct(full, ["doc_id", "a"]).collect())
    assert got == want


def test_oversized_history_bucket_is_capped(spark):
    """10k identical historical docs form one giant band bucket; the cap
    must keep the candidate join bounded (the shard doc still drops via
    its OWN bucket matches only when the bucket survives — identical
    content is the exact pass's job, and it catches it first)."""
    hist = spark.createDataFrame(
        [(i, "the same boilerplate page " * 10) for i in range(10_000)],
        ["doc_id", "text"],
    )
    index = INC.build_dedup_index(hist)
    shard = spark.createDataFrame(
        [(99_999, "the same boilerplate page " * 10)], ["doc_id", "text"]
    )
    kept, dropped = INC.dedup_against_index(shard, index, threshold=0.8)
    rows = dropped.collect()
    # caught by the EXACT pass (one semi join) — never the pair join
    assert [r["reason"] for r in rows] == ["exact"]
    assert kept.count() == 0
