"""md5int ANN oracle family (round 4): the DSIR fit_oracle_sql pattern
applied to LSH/IVF — planes and centroids are pure md5 functions of
(seed, salt, i, j), bucketing runs over fixed-point-quantized vectors
(exact integer float64 math), so DuckDB recomputes the ENTIRE query:
signatures, cell assignments, probe sets, and the final top-k.

Covers: cross-engine row-for-row equality vs ann_oracle_sql, exactness
of the quantized signature under both sig_method variants, md5 matrix
portability, and recall of the oracle family vs brute force (it must
stay a real ANN index, not just an oracle-friendly toy).
"""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from autoprepad_spark.operators import similarity as SIM


def _clustered_embeddings(n=120, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(8, dim)) * 4.0
    vecs = np.vstack(
        [centers[i % 8] + rng.normal(size=dim) * 0.3 for i in range(n)]
    ).astype(np.float32)
    return vecs


@pytest.fixture(scope="module")
def em_parquet(spark, tmp_path_factory):
    vecs = _clustered_embeddings()
    rows = [(i, [float(x) for x in vecs[i]], "l") for i in range(len(vecs))]
    em = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    path = str(tmp_path_factory.mktemp("ann") / "embeddings.parquet")
    em.coalesce(1).write.mode("overwrite").parquet(path)
    return path


def test_md5_int_matrix_is_md5_of_seed_salt_i_j():
    m = SIM.md5_int_matrix(3, 4, 42, "plane")
    for i in range(3):
        for j in range(4):
            h = int(
                hashlib.md5(f"42:plane:{i}:{j}".encode()).hexdigest()[:8], 16
            )
            assert m[i, j] == float((h % 255) - 127)
    assert m.min() >= -127 and m.max() <= 127
    # float64 holding exact integers (the exact-arithmetic contract)
    assert (m == np.round(m)).all()


def test_ann_md5int_matches_duckdb_oracle(spark, em_parquet):
    """Row-for-row: Spark md5int LSH+IVF union == ann_oracle_sql."""
    em = spark.read.parquet(em_parquet)
    q = em.filter(F.col("vec_id") < 6)
    lsh = SIM.lsh_topk(
        em, q, k=4, dim=16, n_planes=10, n_tables=3, seed=11, family="md5int"
    ).select(
        F.lit("lsh").alias("method"), "query_id", "neighbor_id",
        F.round("cos_sim", 4).alias("cos_sim"),
    )
    assigned, cents = SIM.ivf_build(
        em, n_cells=6, seed=11, method="md5int", dim=16
    )
    ivf = SIM.ivf_topk(
        assigned, cents, q, k=4, nprobe=2, family="md5int"
    ).select(
        F.lit("ivf").alias("method"), "query_id", "neighbor_id",
        F.round("cos_sim", 4).alias("cos_sim"),
    )
    got = sorted(
        (r["method"], r["query_id"], r["neighbor_id"], r["cos_sim"])
        for r in lsh.unionByName(ivf).collect()
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{em_parquet}/*.parquet'"
    )
    sql = SIM.ann_oracle_sql(
        query_pred="vec_id < 6", k=4, n_planes=10, n_tables=3, lsh_seed=11,
        n_cells=6, ivf_seed=11, nprobe=2, dim=16,
    )
    want = sorted(
        (m, int(qi), int(ni), round(float(s), 4))
        for m, qi, ni, s in con.execute(sql).fetchall()
    )
    assert [g[:3] for g in got] == [w[:3] for w in want]  # identical sets+ranks
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], abs=1e-4)


def test_md5int_signature_engine_invariant(spark, em_parquet):
    """Quantized integer dot products are order-free: the matmul UDF and
    the codegen expression fold produce IDENTICAL signatures (for float
    gaussian planes they may differ near zero — the reason callers pick
    one variant; the oracle family has no such caveat)."""
    em = spark.read.parquet(em_parquet)
    planes = SIM.md5_int_matrix(10, 16, 11, "plane")
    qv = SIM.quantize_vec("embedding")
    u = SIM.lsh_signature_udf(planes)
    got = em.select(
        "vec_id",
        u(qv).alias("sig_udf"),
        SIM.lsh_signature(qv, planes.tolist()).alias("sig_expr"),
    ).collect()
    assert all(r["sig_udf"] == r["sig_expr"] for r in got)


def test_md5int_family_recall_vs_brute_force(spark, em_parquet):
    """The oracle family must remain a working ANN index on clustered
    data — same recall bar as the gaussian-family test."""
    em = spark.read.parquet(em_parquet)
    q = em.filter(F.col("vec_id") < 5)
    exact = SIM.brute_force_topk(em, q, k=3).collect()
    approx = SIM.lsh_topk(em, q, k=3, dim=16, family="md5int").collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert len(exact_set & approx_set) >= len(exact_set) // 2


def test_jl_md5int_matches_duckdb_oracle(spark, em_parquet):
    """Row-for-row: jl_topk (md5int family) == the oracle's jl branch.

    Projected coordinates are exact-integer float64 (quantized vectors x
    integer md5 matrix), so the only float work is the final cosine —
    rounded to 4 decimals and RANKED on the rounded value on both sides,
    which is what makes the top-k cut engine-invariant (see jl_topk)."""
    em = spark.read.parquet(em_parquet)
    q = em.filter(F.col("vec_id") < 6)
    got = sorted(
        ("jl", r["query_id"], r["neighbor_id"], r["cos_sim"])
        for r in SIM.jl_topk(
            em, q, k=4, out_dim=8, dim=16, seed=11, family="md5int"
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{em_parquet}/*.parquet'"
    )
    sql = SIM.ann_oracle_sql(
        query_pred="vec_id < 6", k=4, dim=16, jl_dim=8, jl_seed=11
    )
    want = sorted(
        (m, int(qi), int(ni), round(float(s), 4))
        for m, qi, ni, s in con.execute(sql).fetchall()
        if m == "jl"
    )
    assert [g[:3] for g in got] == [w[:3] for w in want]
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], abs=1e-4)


def test_jl_projection_exactness_and_numpy_parity(spark, em_parquet):
    """md5int JL coordinates are exact integers and equal a driver-side
    numpy recomputation bit-for-bit; the gaussian family matches numpy
    within float tolerance."""
    em = spark.read.parquet(em_parquet)
    mat = SIM.md5_int_matrix(8, 16, 11, "jl")
    rows = SIM.jl_project(
        em, out_dim=8, dim=16, seed=11, out_col="pv", family="md5int"
    ).select("vec_id", "embedding", "pv").collect()
    for r in rows:
        v = np.floor(np.asarray(r["embedding"], dtype=np.float64) * 1000.0 + 0.5)
        want = v @ mat.T
        got = np.asarray(r["pv"])
        assert (got == np.round(got)).all()  # exact integers in float64
        assert (got == want).all()


def test_jl_recall_vs_brute_force(spark, em_parquet):
    """Compressed-space top-k must preserve NEAR-neighborhood on
    clustered data (16d -> 8d): JL's contract is distance preservation
    up to distortion, not exact rank order among a cluster's near-ties,
    so the bar is compressed top-3 ⊆ true top-10 for >= 2/3 of pairs
    (exact-top-3 agreement on this fixture is a coin flip between
    same-cluster mates whose cosines differ in the 3rd decimal)."""
    em = spark.read.parquet(em_parquet)
    q = em.filter(F.col("vec_id") < 5)
    exact10 = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.brute_force_topk(em, q, k=10).collect()
    }
    approx = SIM.jl_topk(em, q, k=3, out_dim=8, dim=16, family="md5int").collect()
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert len(approx_set) == 15
    assert len(approx_set & exact10) >= 10


def test_jl_topk_plan_shape(spark, em_parquet):
    """Physical plan: the projected query side broadcasts (corpus is
    never shuffled) and no sort-merge join appears — the compressed
    brute-force scan is one pass over the corpus."""
    em = spark.read.parquet(em_parquet)
    q = em.filter(F.col("vec_id") < 6)
    out = SIM.jl_topk(em, q, k=4, out_dim=8, dim=16, seed=11)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan or "BroadcastQueryStage" in plan
    assert "SortMergeJoin" not in plan


def test_jl_zero_norm_vectors_excluded_and_oracle_agrees(spark, tmp_path):
    """A vector whose every coordinate quantizes to 0 has an undefined
    cosine in the compressed space — Spark yields NULL (sorts last
    DESC), DuckDB NaN (sorts FIRST) — so jl_topk and the oracle both
    EXCLUDE zero-norm projected vectors; parity must survive their
    presence."""
    rng = np.random.default_rng(9)
    rows = [(i, [float(x) for x in rng.normal(size=16)], "l") for i in range(30)]
    rows.append((30, [1e-5] * 16, "l"))  # quantizes to the zero vector
    em = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    path = str(tmp_path / "z.parquet")
    em.coalesce(1).write.mode("overwrite").parquet(path)
    emr = spark.read.parquet(path)
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["cos_sim"])
        for r in SIM.jl_topk(
            emr, emr.filter(F.col("vec_id") < 3), k=4, out_dim=8, dim=16,
            seed=11, family="md5int",
        ).collect()
    )
    assert all(n != 30 for _, n, _ in got)  # zero vector never a neighbor
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{path}/*.parquet'")
    want = sorted(
        (int(qi), int(ni), round(float(s), 4))
        for m, qi, ni, s in con.execute(
            SIM.ann_oracle_sql(
                query_pred="vec_id < 3", k=4, dim=16, jl_dim=8, jl_seed=11
            )
        ).fetchall()
        if m == "jl"
    )
    assert [g[:2] for g in got] == [w[:2] for w in want]


def test_jl_topk_empty_corpus_raises_cleanly(spark):
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label string"
    )
    with pytest.raises(ValueError, match="cannot infer embedding width"):
        SIM.jl_topk(empty, empty, k=3)
