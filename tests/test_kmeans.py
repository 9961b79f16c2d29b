"""Distributed Lloyd k-means (ann/kmeans.py).

The strong check is the pure-NumPy differential: the whole fit is
deterministic integer-or-single-IEEE-op arithmetic, so the distributed
run must be BIT-IDENTICAL to a single-machine replay — centroids,
inertia trace, and assignments. Partitioning invariance then follows
from the integer-sum update, and is asserted independently.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xorfilter_net_spark.ann.kmeans import (
    _Q,
    kmeans_assign,
    kmeans_cell_profile,
    kmeans_fit,
)
from xorfilter_net_spark.sources.session import load_table


def _load(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    pdf = emb.orderBy("vec_id").toPandas()
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    return emb, ids, x


def _normalize(mat):
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return np.divide(mat, norms, out=np.zeros_like(mat), where=norms > 0)


def _replay(ids, x, k, iters, seed):
    """Single-machine replay of the exact distributed algorithm."""
    import hashlib

    hexes = [
        hashlib.md5(f"{i}:{seed}".encode()).hexdigest() for i in ids
    ]
    order = sorted(range(len(ids)), key=lambda j: (hexes[j], ids[j]))
    cent = _normalize(x[order[:k]])
    keff = cent.shape[0]
    inertia = []
    sizes = {}
    xq = np.floor(x * _Q).astype(np.int64)
    for _ in range(iters):
        xn = _normalize(x)
        sims = xn @ cent.T
        assign = np.argmax(sims, axis=1)
        best = sims[np.arange(len(x)), assign]
        inertia.append(int((1_000_000 - np.floor(best * _Q)).astype(np.int64).sum()))
        nxt = cent.copy()
        sizes = {}
        for j in range(keff):
            m = assign == j
            sizes[j] = int(m.sum())
            if m.any():
                nxt[j] = xq[m].sum(axis=0).astype(np.float64) / _Q / m.sum()
        cent = _normalize(nxt)
    # the labeling pass (kmeans_assign) runs against the FINAL centroids
    final_assign = np.argmax(_normalize(x) @ cent.T, axis=1)
    return cent, inertia, sizes, final_assign


@pytest.fixture(scope="module")
def fitted(spark, sf_tiny):
    emb, ids, x = _load(spark, sf_tiny)
    fit = kmeans_fit(emb, "vec_id", "embedding", k=6, iters=5, seed=11)
    return emb, ids, x, fit


class TestKMeansDifferential:
    def test_centroids_bit_identical_to_replay(self, fitted):
        emb, ids, x, fit = fitted
        cent, inertia, sizes, _ = _replay(ids, x, k=6, iters=5, seed=11)
        assert np.array_equal(fit["centroids"], cent)
        assert fit["inertia_e6"] == inertia
        assert fit["sizes"] == sizes

    def test_assignment_matches_replay(self, fitted, spark):
        emb, ids, x, fit = fitted
        _, _, _, assign = _replay(ids, x, k=6, iters=5, seed=11)
        got = (
            kmeans_assign(emb, "vec_id", "embedding", fit["centroids"])
            .orderBy("id")
            .toPandas()
        )
        assert np.array_equal(got["id"].to_numpy(dtype=np.int64), ids)
        assert np.array_equal(got["cell"].to_numpy(dtype=np.int64), assign)

    def test_inertia_monotone_within_floor_slack(self, fitted):
        _, ids, _, fit = fitted
        tr = fit["inertia_e6"]
        n = len(ids)
        assert all(b <= a + n for a, b in zip(tr, tr[1:]))

    def test_sizes_cover_corpus(self, fitted):
        _, ids, _, fit = fitted
        assert sum(fit["sizes"].values()) == len(ids)


class TestKMeansInvariance:
    def test_partitioning_invariant(self, spark, sf_tiny):
        emb, _, _ = _load(spark, sf_tiny)
        a = kmeans_fit(emb.repartition(7), "vec_id", "embedding", k=5, iters=3, seed=3)
        b = kmeans_fit(emb.repartition(2), "vec_id", "embedding", k=5, iters=3, seed=3)
        assert np.array_equal(a["centroids"], b["centroids"])
        assert a["inertia_e6"] == b["inertia_e6"]
        assert a["sizes"] == b["sizes"]

    def test_k_larger_than_corpus(self, spark):
        pdf = pd.DataFrame(
            {"vec_id": [1, 2, 3], "embedding": [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]}
        )
        emb = spark.createDataFrame(pdf)
        fit = kmeans_fit(emb, "vec_id", "embedding", k=10, iters=2, seed=1)
        assert fit["centroids"].shape[0] == 3
        assert sum(fit["sizes"].values()) == 3


class TestKMeansQuerySurface:
    def test_cell_profile(self, spark, sf_tiny):
        emb = load_table(spark, sf_tiny, "embeddings")
        prof = kmeans_cell_profile(
            emb, "vec_id", "embedding", k=4, iters=3, seed=11
        ).toPandas()
        n = emb.count()
        assert prof["n_members"].sum() == n
        assert prof["inertia_monotone"].all()
        assert (prof["min_cos_e6"] <= 1_000_000).all()
