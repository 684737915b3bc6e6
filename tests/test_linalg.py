"""Numeric validation of the linear-algebra queries against numpy
ground truth (the queries' cross-engine parity is driver/harness
territory; these tests pin the MATH)."""

from __future__ import annotations

import numpy as np

from huracan_spark.queries.registry import REGISTRY, spark_queries

spark_queries()


def _embeddings_np(spark, sf_dir):
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    return np.array([r[1] for r in rows], dtype=np.float64)


def test_pca_power_iteration_matches_numpy(spark, sf_dir):
    """The Spark plan computes EXACTLY two power-iteration steps from
    the uniform init — replicate them in numpy and demand agreement to
    the rounding precision."""
    X = _embeddings_np(spark, sf_dir)
    Xc = X - X.mean(axis=0)
    v = np.full(64, 1.0 / 8.0)
    y1 = Xc.T @ (Xc @ v)
    v1 = y1 / np.linalg.norm(y1)
    y2 = Xc.T @ (Xc @ v1)
    nrm2 = np.linalg.norm(y2)
    want = {
        d + 1: (round(y2[d] / nrm2, 6), round(nrm2 / len(X), 6))
        for d in range(64)
    }
    got = {
        r.dim: (r.component, r.eigenvalue)
        for r in REGISTRY["pca_power_iteration"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d][0] - want[d][0]) < 2e-6, d
        assert abs(got[d][1] - want[d][1]) < 2e-6, d


def test_int8_quant_rmse_bounded_by_half_step(spark, sf_dir):
    """Max-abs symmetric quantization can never err more than half a
    step (scale/254) per value, so per-dim RMSE must respect that."""
    rows = REGISTRY["embedding_int8_quant"].fn(spark, sf_dir).collect()
    assert len(rows) == 64
    for r in rows:
        assert 0.0 <= r.rmse <= r.scale / 254.0 + 1e-9, r.dim
        assert r.n_saturated >= 1  # the max-abs element itself


def test_jl_distortion_concentrates_near_one(spark, sf_dir):
    """JL with K=16 preserves squared distances in expectation: the
    probe-pair distortion distribution must center near 1."""
    rows = REGISTRY["jl_projection_distortion"].fn(spark, sf_dir).collect()
    assert len(rows) == 40 * 39 // 2
    ratios = np.array([r.distortion for r in rows])
    assert 0.8 < ratios.mean() < 1.25
    assert (ratios > 0).all()


def test_pca_deflation_matches_numpy_and_is_orthogonal(spark, sf_dir):
    X = _embeddings_np(spark, sf_dir)
    Xc = X - X.mean(axis=0)
    v0 = np.full(64, 1.0 / 8.0)

    def two_steps(M, v):
        y = M.T @ (M @ v)
        v1 = y / np.linalg.norm(y)
        y2 = M.T @ (M @ v1)
        return y2 / np.linalg.norm(y2), np.linalg.norm(y2)

    c1, nrm1 = two_steps(Xc, v0)
    Xc2 = Xc - np.outer(Xc @ c1, c1)
    c2, nrm2 = two_steps(Xc2, v0)

    rows = REGISTRY["pca_deflation_top2"].fn(spark, sf_dir).collect()
    got1 = np.array([r.comp1 for r in sorted(rows, key=lambda r: r.dim)])
    got2 = np.array([r.comp2 for r in sorted(rows, key=lambda r: r.dim)])
    assert np.allclose(got1, c1, atol=2e-6)
    assert np.allclose(got2, c2, atol=2e-6)
    assert abs(float(got1 @ got2)) < 1e-3  # deflation => near-orthogonal
    r0 = rows[0]
    assert abs(r0.eig1 - nrm1 / len(X)) < 2e-6
    assert abs(r0.eig2 - nrm2 / len(X)) < 2e-6
    assert r0.eig1 >= r0.eig2 > 0
