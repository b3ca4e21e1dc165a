"""Distributed PCA (operators/spectral.py): numpy parity of the
sufficient-statistics fit, subspace/sign canonicalization, projection
and reconstruction-error scoring, fan-in tree behavior, and the
compress-then-cluster integration contract.

Oracle discipline: numpy on the collected vectors IS the oracle — the
fit is float (eigh), so parity is approx-tolerance, with the subspace
itself compared via |cosine| (rotation-invariant) rather than raw
component entries.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from autoprepad_spark.operators import spectral as SP

DIM = 12
K = 3


def _mk_vectors(n=400, seed=7):
    """Anisotropic cloud: variance concentrated in 3 known directions,
    plus 5 off-subspace outliers at the end."""
    rng = np.random.default_rng(seed)
    basis = np.linalg.qr(rng.normal(size=(DIM, DIM)))[0]
    scales = np.array([10.0, 6.0, 3.0] + [0.1] * (DIM - 3))
    pts = (rng.normal(size=(n, DIM)) * scales) @ basis.T + rng.normal(size=DIM)
    outliers = pts[:5] + 25.0 * basis[:, -1]  # push along a tiny-variance axis
    return np.vstack([pts, outliers])


@pytest.fixture(scope="module")
def vec_df(spark):
    vecs = _mk_vectors()
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), vecs


def test_fit_matches_numpy_covariance(vec_df):
    df, vecs = vec_df
    model = SP.fit_pca(df, k=K, dim=DIM)
    assert model.n == len(vecs)
    want_mu = vecs.mean(axis=0)
    assert np.allclose(model.mean, want_mu, atol=1e-9)
    cov = np.cov(vecs, rowvar=False, ddof=1)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert np.allclose(model.explained_variance, evals[:K], rtol=1e-9)
    assert model.total_variance == pytest.approx(float(np.sum(evals)), rel=1e-9)
    # subspace parity: each fitted component is (+/-) the numpy one;
    # compare |cosine| so eigensolver sign conventions can't matter
    _, evec = np.linalg.eigh(cov)
    top = evec[:, np.argsort(np.linalg.eigvalsh(cov))[::-1][:K]].T
    for got, want in zip(np.asarray(model.components), top):
        assert abs(float(got @ want)) == pytest.approx(1.0, abs=1e-9)
    # sign canonicalization: largest-|x| coordinate is positive
    for c in np.asarray(model.components):
        assert c[int(np.argmax(np.abs(c)))] > 0


def test_fit_parallelism_and_fanin_independent(vec_df):
    df, _ = vec_df
    a = SP.fit_pca(df.repartition(1), k=K, dim=DIM)
    b = SP.fit_pca(df.repartition(37), k=K, dim=DIM, fanin=4)
    assert np.allclose(a.mean, b.mean, atol=1e-9)
    assert np.allclose(a.explained_variance, b.explained_variance, rtol=1e-9)
    for ca, cb in zip(np.asarray(a.components), np.asarray(b.components)):
        assert abs(float(ca @ cb)) == pytest.approx(1.0, abs=1e-8)


def test_projection_matches_numpy(vec_df):
    df, vecs = vec_df
    model = SP.fit_pca(df, k=K, dim=DIM)
    got = {
        r["vec_id"]: np.asarray(r["p"])
        for r in df.select(
            "vec_id", SP.pca_project_udf(model)(F.col("embedding")).alias("p")
        ).collect()
    }
    mu = np.asarray(model.mean)
    comps = np.asarray(model.components)
    for i in range(len(vecs)):
        want = (vecs[i] - mu) @ comps.T
        assert np.allclose(got[i], want, atol=1e-9)


def test_reconstruction_error_flags_off_subspace_outliers(vec_df):
    df, vecs = vec_df
    model = SP.fit_pca(df, k=K, dim=DIM)
    scored = df.select(
        "vec_id", SP.pca_score_udf(model)(F.col("embedding")).alias("s")
    ).collect()
    s = {r["vec_id"]: r["s"] for r in scored}
    n = len(vecs)
    outlier_ids = set(range(n - 5, n))
    top5 = sorted(s, key=s.get, reverse=True)[:5]
    assert set(top5) == outlier_ids
    assert min(s[i] for i in outlier_ids) > 3 * np.median(list(s.values()))


def test_null_and_wrong_width_rows_are_skipped(spark):
    rows = [(0, [1.0, 2.0]), (1, None), (2, [3.0]), (3, [5.0, 6.0]),
            (4, [9.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    model = SP.fit_pca(df, k=1, dim=2)
    assert model.n == 3  # ids 0, 3, 4


def test_guards(spark, vec_df):
    df, _ = vec_df
    with pytest.raises(ValueError, match="k must be"):
        SP.fit_pca(df, k=0, dim=DIM)
    with pytest.raises(ValueError, match="k must be"):
        SP.fit_pca(df, k=DIM + 1, dim=DIM)
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no usable vectors"):
        SP.fit_pca(empty, k=1, dim=DIM)


def test_pca_compress_reuses_model_on_new_shard(spark, vec_df):
    df, vecs = vec_df
    compressed, model = SP.pca_compress(df, k=K, dim=DIM)
    assert compressed.schema["pca_vec"].dataType.simpleString() == "array<double>"
    assert compressed.count() == len(vecs)
    # project a NEW shard with the fitted model (no refit): numpy parity
    rng = np.random.default_rng(11)
    new = rng.normal(size=(4, DIM))
    shard = spark.createDataFrame(
        [(100 + i, [float(x) for x in new[i]]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: np.asarray(r["p"])
        for r in shard.select(
            "vec_id", SP.pca_project_udf(model)(F.col("embedding")).alias("p")
        ).collect()
    }
    mu, comps = np.asarray(model.mean), np.asarray(model.components)
    for i in range(4):
        assert np.allclose(got[100 + i], (new[i] - mu) @ comps.T, atol=1e-9)


def test_pca_compress_feeds_semantic_dedup(spark):
    """Composition contract: pca_compress output is a valid embedding
    column for semantic_duplicates (the fitted alternative to
    project_dim's oblivious JL path). Tight duplicate pairs must still
    collapse in the compressed space."""
    from autoprepad_spark.operators.similarity import semantic_duplicates
    from autoprepad_spark.operators import spectral as SP

    rng = np.random.default_rng(5)
    basis = np.linalg.qr(rng.normal(size=(DIM, DIM)))[0]
    scales = np.array([9.0, 5.0, 2.0] + [0.05] * (DIM - 3))
    base = (rng.normal(size=(40, DIM)) * scales) @ basis.T
    rows = []
    for i in range(40):
        rows.append((2 * i, [float(x) for x in base[i]]))
        rows.append((2 * i + 1, [float(x) for x in base[i] * 1.0000001]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    compressed, model = SP.pca_compress(df, k=3, dim=DIM)
    out = {
        r["vec_id"]: r["keep"]
        for r in semantic_duplicates(
            compressed, eps=0.999, n_cells=2, vec_col="pca_vec"
        ).collect()
    }
    assert len(out) == 80
    # every engineered pair loses exactly one member
    for i in range(40):
        assert out[2 * i] != out[2 * i + 1], i
