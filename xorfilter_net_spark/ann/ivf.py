"""IVF (inverted-file) ANN: k-means coarse quantizer + nprobe search.

The third similarity-search path beside brute force (exact baseline,
``ann/brute.py``) and sign-LSH (``ann/lsh.py``). IVF is the classic
scale architecture (Jegou et al., "Product Quantization for Nearest
Neighbor Search", the IVF part): partition the corpus into ``n_cells``
Voronoi cells around trained centroids, then search only the ``nprobe``
cells nearest each query.

Spark shape, 100 TB-minded:
- *Train*: centroids are fit driver-side with NumPy Lloyd iterations on
  a deterministic hash-sample of the corpus (sampling is a pushed-down
  filter; the sample, not the corpus, crosses to the driver). Centroid
  count and sample size are both O(KBs-MBs) — broadcast material.
- *Assign*: map-only ``mapInPandas`` argmax over the broadcast centroid
  matrix; emits ``(cell, id)``. At 10^12 rows this is the same
  embarrassingly-parallel shape as the digest stage of the XOR build.
- *Search*: the query->cell probe list is tiny and broadcasts; the
  corpus-side assignment joins it on ``cell`` (broadcast hash join, no
  shuffle of the corpus), and the surviving ~nprobe/n_cells fraction is
  exactly reranked with the same quantized-cosine kernel the other ANN
  paths use. Per-query cost drops by ~n_cells/nprobe vs brute force.

Determinism: sampling, init, and iteration order are all fixed by
(seed, n_cells, iters) — no library RNG state, so train/assign/search
reproduce bit-identically across runs and partitionings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..text.fingerprint import splitmix64
from .brute import _stack, cosine_e6, quantize

__all__ = ["train_centroids", "assign_cells", "ivf_topk_cosine"]


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return np.divide(mat, norms, out=np.zeros_like(mat), where=norms > 0)


def train_centroids(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int = 64,
    iters: int = 10,
    seed: int = 11,
    sample_mod: int = 1,
) -> np.ndarray:
    """Spherical k-means centroids (unit-norm, cosine objective).

    ``sample_mod > 1`` trains on the deterministic hash-sample
    ``xxhash64(id) % sample_mod == 0`` — the filter runs corpus-side, so
    only ~1/sample_mod of rows reach the driver. Init picks splitmix64-
    derived sample rows; Lloyd iterations run in one NumPy matmul each.
    """
    src = emb.select(F.col(id_col).cast("long").alias("id"), vec_col)
    if sample_mod > 1:
        src = src.filter(F.pmod(F.xxhash64("id"), F.lit(sample_mod)) == 0)
    pdf = src.orderBy("id").toPandas()
    x = _normalize(_stack(pdf[vec_col]))
    n = x.shape[0]
    if n == 0:
        raise ValueError("cannot train IVF centroids on an empty sample")
    k = min(n_cells, n)
    # deterministic distinct init rows via splitmix counter probing
    picks: list[int] = []
    seen: set[int] = set()
    c = 0
    while len(picks) < k:
        r = int(splitmix64(np.uint64(seed * 0x9E3779B1 + c)) % np.uint64(n))
        c += 1
        if r not in seen:
            seen.add(r)
            picks.append(r)
    cent = x[np.array(picks, dtype=np.int64)]
    for _ in range(iters):
        # cosine assignment == argmax dot on unit vectors
        assign = np.argmax(x @ cent.T, axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                cent[j] = x[m].mean(axis=0)
        cent = _normalize(cent)
    return cent


def assign_cells(
    emb: DataFrame, id_col: str, vec_col: str, centroids: np.ndarray
) -> DataFrame:
    """(id, cell) assignment — map-only argmax against the broadcast
    centroid matrix (the IVF 'index build')."""
    cent = centroids  # captured in the closure -> task broadcast

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = _normalize(_stack(pdf[vec_col]))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(dtype=np.int64),
                    "cell": np.argmax(x @ cent.T, axis=1).astype(np.int32),
                }
            )

    return emb.select(
        F.col(id_col).cast("long").alias(id_col), vec_col
    ).mapInPandas(gen, schema="id long, cell int")


def ivf_topk_cosine(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    n_cells: int = 64,
    nprobe: int = 8,
    iters: int = 10,
    seed: int = 11,
    sample_mod: int = 1,
    centroids: np.ndarray | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k via nprobe nearest cells + exact rerank.

    Output schema matches ``brute.topk_cosine``: (qid, neighbor_id,
    cos_e6, rn). Recall rises with nprobe/n_cells (nprobe == n_cells is
    exhaustive == brute force).
    """
    if centroids is None:
        centroids = train_centroids(
            emb, id_col, vec_col, n_cells, iters, seed, sample_mod
        )
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    qmat_f = _stack(pd.Series([q[1] for q in queries]))
    qmat = quantize(qmat_f)
    qnorm = (qmat * qmat).sum(axis=1)

    # per-query probe list: nprobe nearest centroids (driver-side, tiny)
    sims = _normalize(qmat_f) @ centroids.T
    np_eff = min(nprobe, centroids.shape[0])
    probe = np.argsort(-sims, axis=1)[:, :np_eff]
    spark = emb.sparkSession
    qdf = spark.createDataFrame(
        [
            (int(qids[j]), int(probe[j, p]))
            for j in range(len(qids))
            for p in range(np_eff)
        ],
        "qid long, cell int",
    )

    assigned = assign_cells(emb, id_col, vec_col, centroids)
    cand = (
        assigned.join(F.broadcast(qdf), "cell")
        .select("qid", F.col("id").alias("neighbor_id"))
    )
    if exclude_self:
        cand = cand.filter(F.col("qid") != F.col("neighbor_id"))

    qindex = {int(q): j for j, q in enumerate(qids)}

    def rerank(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            emat = quantize(_stack(pdf[vec_col]))
            enorm = (emat * emat).sum(axis=1)
            qj = np.array([qindex[q] for q in pdf["qid"]], dtype=np.int64)
            dots = (emat * qmat[qj]).sum(axis=1)
            yield pd.DataFrame(
                {
                    "qid": pdf["qid"],
                    "neighbor_id": pdf["neighbor_id"],
                    "cos_e6": cosine_e6(dots, enorm, qnorm[qj]),
                }
            )

    vecs = emb.select(F.col(id_col).cast("long").alias("neighbor_id"), vec_col)
    scored = cand.join(vecs, "neighbor_id").mapInPandas(
        rerank, schema="qid long, neighbor_id long, cos_e6 long"
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cos_e6").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "neighbor_id", "cos_e6", "rn")
    )
