"""FD-based PCA projection (ann/project.py) — subspace quality tests."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from xorfilter_net_spark.ann.project import (
    captured_energy_ratio,
    fd_principal_directions,
    fd_project,
)


def _lowrank_corpus(rng, n=300, d=16, r_true=3, noise=0.01):
    """Rows concentrated in an r_true-dim subspace + tiny noise."""
    basis = np.linalg.qr(rng.randn(d, r_true))[0]
    z = rng.randn(n, r_true) * np.array([5.0, 3.0, 1.5])
    return z @ basis.T + noise * rng.randn(n, d)


def _df(spark, mat):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, v array<double>",
    )


def test_fd_subspace_captures_lowrank_energy(spark):
    rng = np.random.RandomState(5)
    mat = _lowrank_corpus(rng)
    w = fd_principal_directions(_df(spark, mat), "v", r=3, ell=16, d=16)
    assert w.shape == (16, 3)
    # orthonormal columns
    assert np.allclose(w.T @ w, np.eye(3), atol=1e-8)
    ratio = captured_energy_ratio(mat, w)
    # exact top-3 captures ~1 - noise; FD must be within its bound
    _, s, vt = np.linalg.svd(mat, full_matrices=False)
    exact = captured_energy_ratio(mat, vt[:3].T)
    assert ratio > exact - 0.05
    assert ratio > 0.95


def test_fd_project_rows_match_matrix_product(spark):
    rng = np.random.RandomState(9)
    mat = _lowrank_corpus(rng, n=100)
    df = _df(spark, mat)
    w = fd_principal_directions(df, "v", r=3, ell=16, d=16)
    out = {r.vec_id: np.array(r.proj) for r in
           fd_project(df, "vec_id", "v", r=3, ell=16).collect()}
    want = mat @ w
    for i in range(100):
        assert np.allclose(out[i], want[i], atol=1e-9)


def test_fd_exact_below_buffer(spark):
    """With fewer rows than the FD buffer nothing shrinks: B'B == A'A
    and the directions equal exact PCA up to sign."""
    rng = np.random.RandomState(11)
    mat = rng.randn(20, 8)
    w = fd_principal_directions(_df(spark, mat), "v", r=2, ell=32, d=8)
    _, _, vt = np.linalg.svd(mat, full_matrices=False)
    exact = vt[:2].T
    # same subspace: |cos| of principal angles == 1
    overlap = np.abs(np.linalg.svd(w.T @ exact, compute_uv=False))
    assert np.allclose(overlap, 1.0, atol=1e-6)
