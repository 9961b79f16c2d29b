"""Fully distributed Lloyd k-means over an embedding column.

The IVF trainer (``ann/ivf.py::train_centroids``) fits centroids
driver-side on a hash-sample — the right call when a sample suffices.
This module is the *corpus-scale* counterpart: every Lloyd iteration
runs over ALL rows and **no vector ever reaches the driver**; the only
cross-boundary traffic per iteration is the k x d table of quantized
per-cell component sums (a few KB at k=64, d=64 — independent of corpus
size).

Spark shape, 100 TB-minded (per iteration):
- ONE ``mapInPandas`` pass computes, per Arrow batch, the cosine argmax
  assignment against the broadcast centroid matrix AND the batch-local
  per-cell partial sums (quantized int64 micro-units) — a map-side
  combine, so each task emits at most k x d partial rows, never points;
- a k x d-bounded hash aggregate reduces the partials; the driver
  divides to means, re-normalizes (spherical k-means), and broadcasts
  the next centroid matrix. Empty cells keep their previous centroid.
- The quantized inertia (sum over points of ``1e6 - cos_e6(x, c)``)
  accumulates in the same pass as exact int64, so the objective history
  is partitioning-invariant.

Determinism: init picks the k hash-smallest ids (``md5(id + ':' +
seed)`` order — engine-portable, so the DuckDB oracle replays it; a
bottom-k sample, only k rows cross to the driver); assignment, update
sums, and inertia are pure functions of (centroids, batch) with integer
accumulation, so the whole fit is bit-identical across runs,
partitionings, and the pure-NumPy replay in tests/test_kmeans.py.

No reference counterpart (the reference is a membership-filter library);
this is the mandated training-data-pipeline clustering primitive that
SemDeDup / IVF build on, promoted from sample-trained to corpus-trained.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .brute import _stack

__all__ = ["kmeans_fit", "kmeans_assign", "kmeans_cell_profile"]

_Q = 1_000_000.0  # micro-unit quantization for cross-boundary sums


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return np.divide(mat, norms, out=np.zeros_like(mat), where=norms > 0)


def _init_centroids(
    emb: DataFrame, id_col: str, vec_col: str, k: int, seed: int
) -> np.ndarray:
    """k hash-smallest rows (deterministic bottom-k; only k rows collect).

    The hash order is ``md5(str(id) + ':' + str(seed))`` — the repo's
    engine-portable hash idiom (same convention as the sampling/split
    family), chosen over xxhash64 so the DuckDB oracle can replay the
    init ordering byte-identically (``md5(id::varchar || ':seed')``).
    """
    rows = (
        emb.select(F.col(id_col).cast("long").alias("id"), vec_col)
        .orderBy(
            F.md5(F.concat(F.col("id").cast("string"), F.lit(f":{seed}"))),
            F.col("id"),
        )
        .limit(k)
        .collect()
    )
    if not rows:
        raise ValueError("cannot fit k-means on an empty corpus")
    return _normalize(_stack(pd.Series([r[vec_col] for r in rows])))


def _iteration_pass(
    src: DataFrame, vec_col: str, cent: np.ndarray
) -> pd.DataFrame:
    """One distributed pass: per-cell (n, per-dim sum_e6, inertia_e6)
    partials per batch, reduced by a k x d-bounded hash aggregate."""
    k, d = cent.shape

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = _stack(pdf[vec_col])
            xn = _normalize(x)
            sims = xn @ cent.T  # (n, k) float64
            assign = np.argmax(sims, axis=1)
            best = sims[np.arange(len(x)), assign]
            # quantized per-point cost: exact int64 accumulation
            cost = (1_000_000 - np.floor(best * _Q)).astype(np.int64)
            xq = np.floor(x.astype(np.float64) * _Q).astype(np.int64)
            cells, pos, ns, sums, costs = [], [], [], [], []
            for j in np.unique(assign):
                m = assign == j
                cells.extend([int(j)] * d)
                pos.extend(range(d))
                ns.extend([int(m.sum())] * d)
                sums.extend(xq[m].sum(axis=0).tolist())
                cj = int(cost[m].sum())
                costs.extend([cj] + [0] * (d - 1))
            yield pd.DataFrame(
                {
                    "cell": np.array(cells, dtype=np.int32),
                    "pos": np.array(pos, dtype=np.int32),
                    "n": np.array(ns, dtype=np.int64),
                    "sum_e6": np.array(sums, dtype=np.int64),
                    "cost_e6": np.array(costs, dtype=np.int64),
                }
            )

    return (
        src.mapInPandas(
            gen,
            schema="cell int, pos int, n long, sum_e6 long, cost_e6 long",
        )
        .groupBy("cell", "pos")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_e6").alias("sum_e6"),
            F.sum("cost_e6").alias("cost_e6"),
        )
        .toPandas()
    )


def kmeans_fit(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 16,
    iters: int = 8,
    seed: int = 11,
) -> dict:
    """Spherical Lloyd k-means; returns ``{"centroids": (k, d) float64,
    "inertia_e6": [int per iteration], "sizes": {cell: n}}``.

    Each iteration's inertia is measured against that iteration's
    INPUT centroids (the standard Lloyd bookkeeping), so the list is
    the objective trace of successive centroid sets. ``sizes`` shares
    that convention: it is the cell census of the LAST iteration's
    assignment (i.e. under the penultimate centroids) — a labeling
    against the returned final centroids (``kmeans_assign``) can
    differ; consumers that publish sizes next to an assignment should
    count the assignment itself (cli.cmd_kmeans does).
    """
    src = emb.select(
        F.col(id_col).cast("long").alias("id"), vec_col
    ).persist()
    try:
        cent = _init_centroids(src, "id", vec_col, k, seed)
        keff = cent.shape[0]
        inertia: list[int] = []
        sizes: dict[int, int] = {}
        for _ in range(iters):
            red = _iteration_pass(src, vec_col, cent)
            inertia.append(int(red["cost_e6"].sum()))
            nxt = cent.copy()
            sizes = {}
            # n is replicated across pos within a cell; take pos==0 rows
            for cell, grp in red.groupby("cell"):
                grp = grp.sort_values("pos")
                n = int(grp["n"].iloc[0])
                sizes[int(cell)] = n
                if n > 0:
                    nxt[int(cell)] = (
                        grp["sum_e6"].to_numpy(dtype=np.float64) / _Q / n
                    )
            cent = _normalize(nxt)
            # re-zero any never-assigned cell's size entry
            for j in range(keff):
                sizes.setdefault(j, 0)
        return {"centroids": cent, "inertia_e6": inertia, "sizes": sizes}
    finally:
        src.unpersist()


def kmeans_assign(
    emb: DataFrame, id_col: str, vec_col: str, centroids: np.ndarray
) -> DataFrame:
    """(id, cell, cos_e6) map-only assignment against the fitted
    centroids — the labeling pass; shares the IVF assignment shape."""
    cent = centroids

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            xn = _normalize(_stack(pdf[vec_col]))
            sims = xn @ cent.T
            assign = np.argmax(sims, axis=1)
            best = sims[np.arange(len(pdf)), assign]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(dtype=np.int64),
                    "cell": assign.astype(np.int32),
                    "cos_e6": np.floor(best * _Q).astype(np.int64),
                }
            )

    return emb.select(
        F.col(id_col).cast("long").alias(id_col), vec_col
    ).mapInPandas(gen, schema="id long, cell int, cos_e6 long")


def kmeans_cell_profile(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 16,
    iters: int = 8,
    seed: int = 11,
) -> DataFrame:
    """Registered-query surface: fit, then per-cell (cell, n_members,
    min_cos_e6, sum_cos_e6) from one assignment pass plus the final
    integer inertia trace facts — every number partitioning-invariant."""
    fit = kmeans_fit(emb, id_col, vec_col, k=k, iters=iters, seed=seed)
    a = kmeans_assign(emb, id_col, vec_col, fit["centroids"])
    # Lloyd is monotone in exact arithmetic; per-point floor quantization
    # of the reported cost can add < 1 micro-unit of flutter per point,
    # so the gate allows exactly that slack (n_points micro-units).
    n_total = sum(fit["sizes"].values())
    mono = all(
        b <= a_ + n_total
        for a_, b in zip(fit["inertia_e6"], fit["inertia_e6"][1:])
    )
    return (
        a.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("cos_e6").alias("min_cos_e6"),
            F.sum("cos_e6").alias("sum_cos_e6"),
        )
        .withColumn("inertia_monotone", F.lit(bool(mono)))
        .orderBy("cell")
    )
