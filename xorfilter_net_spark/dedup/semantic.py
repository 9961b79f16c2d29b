"""SemDeDup-style semantic deduplication over embeddings.

Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" (2023): cluster the embedding space with
k-means, then do exact pairwise cosine only WITHIN each cluster —
the O(n^2) pair problem becomes n_cells independent O((n/n_cells)^2)
problems, each small enough for one vectorized kernel.

Spark shape (composes the existing IVF machinery):
- centroids: ``ann/ivf.py::train_centroids`` (driver NumPy Lloyd over a
  deterministic hash-sample; broadcast material);
- assignment: map-only argmax vs the broadcast centroid matrix;
- per-cell kernel: ``applyInPandas`` over cell groups — a blocked Gram
  matrix in int64 milli-units (the library-wide quantized-cosine
  arithmetic, bit-identical to the DuckDB oracle's expression), memory
  bounded by ``block x cell`` regardless of cell size.

Survivor policy (deterministic, partition-independent): a row is
dropped iff some SMALLER-id row in its cell has cosine >= tau. The
paper keeps one representative per duplicate group (theirs: lowest
centroid-similarity or random; min-id is the deterministic equivalent
and depends only on the pair set, not on visit order).

Approximation contract: within-cell pairs are scored exactly, so
**precision is exact** (every drop has a true >= tau witness) and drops
are a SUBSET of the exact all-pairs drops — clustering can only MISS
cross-cell pairs (recall follows cluster granularity). ``n_cells=1``
degenerates to exact all-pairs semantics (the oracle-checked mode);
the clustered mode is gated on the subset property + recall.

No reference counterpart (mandated training-pipeline operator).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ann.brute import _stack, quantize
from ..ann.ivf import assign_cells, train_centroids

__all__ = ["semantic_dedup", "semdedup_survivors"]


def _cell_kernel(tau_e6: int, id_name: str, block: int = 1024):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_name].to_numpy(dtype=np.int64)
        q = quantize(_stack(pdf["__vec"]))
        norm = np.sqrt((q * q).sum(axis=1).astype(np.float64))
        n = len(ids)
        dropped = np.zeros(n, dtype=bool)
        witness = np.full(n, -1, dtype=np.int64)
        for lo in range(0, n, block):
            hi = min(lo + block, n)
            dots = q[lo:hi] @ q.T  # int64-exact
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.floor(
                    1000000.0
                    * dots.astype(np.float64)
                    / (norm[lo:hi, None] * norm[None, :])
                )
            cos = np.where(np.isfinite(cos), cos, -np.inf)
            # neighbors above tau with a strictly smaller id
            hit = (cos >= tau_e6) & (ids[None, :] < ids[lo:hi, None])
            dropped[lo:hi] = hit.any(axis=1)
            masked = np.where(hit, ids[None, :], np.iinfo(np.int64).max)
            wmin = masked.min(axis=1)
            witness[lo:hi] = np.where(
                dropped[lo:hi], wmin, -1
            )
        return pd.DataFrame(
            {
                id_name: ids,
                "cell": pdf["cell"].to_numpy(dtype=np.int32),
                "dropped": dropped,
                "witness_id": witness,
            }
        )

    return fn


def _soft_assign(
    emb: DataFrame, id_col: str, vec_col: str, cents: np.ndarray, a: int
) -> DataFrame:
    """(id, cell) with each vector in its ``a`` nearest cells — IVF-style
    multi-probe assignment. Two rows sharing ANY cell get compared, so
    recall on wide-angle pairs (which straddle Voronoi boundaries)
    improves at a linear (×a) kernel-work cost."""
    from .. ann.ivf import _normalize

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = _normalize(_stack(pdf[vec_col]))
            sims = x @ cents.T
            top = np.argsort(-sims, axis=1)[:, :a]
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            yield pd.DataFrame(
                {
                    "id": np.repeat(ids, a),
                    "cell": top.reshape(-1).astype(np.int32),
                }
            )

    return emb.select(
        F.col(id_col).cast("long").alias(id_col), vec_col
    ).mapInPandas(gen, schema="id long, cell int")


def semantic_dedup(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    tau_e6: int,
    n_cells: int = 8,
    seed: int = 11,
    iters: int = 10,
    n_assign: int = 1,
) -> DataFrame:
    """(id_col, dropped, witness_id) for every input row.

    ``witness_id`` is the smallest shared-cell id with cosine >= tau (or
    -1 for survivors) — the per-row lineage of why a row was dropped.
    ``n_assign > 1`` soft-assigns each vector to its top-a cells (union
    of verdicts; a row is dropped iff ANY shared cell holds a witness).
    """
    if n_cells == 1:
        assigned = emb.select(
            F.col(id_col).cast("long").alias("id"), F.lit(0).alias("cell")
        )
    else:
        cents = train_centroids(
            emb, id_col, vec_col, n_cells=n_cells, iters=iters, seed=seed
        )
        if n_assign > 1:
            assigned = _soft_assign(emb, id_col, vec_col, cents, n_assign)
        else:
            assigned = assign_cells(emb, id_col, vec_col, cents)
    vecs = emb.select(
        F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("__vec")
    )
    grouped = assigned.join(vecs, "id")
    out_schema = "id long, cell int, dropped boolean, witness_id long"
    per_cell = grouped.groupBy("cell").applyInPandas(
        _cell_kernel(tau_e6, "id"), schema=out_schema
    )
    return (
        per_cell.groupBy("id")
        .agg(
            F.max("dropped").alias("dropped"),
            F.min(F.when(F.col("witness_id") >= 0, F.col("witness_id"))).alias(
                "__w"
            ),
        )
        .select(
            F.col("id").alias(id_col),
            "dropped",
            F.coalesce("__w", F.lit(-1)).alias("witness_id"),
        )
    )


def semdedup_survivors(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    tau_e6: int,
    n_cells: int = 8,
    seed: int = 11,
) -> DataFrame:
    """Rows that survive semantic dedup (min-id representative policy)."""
    labeled = semantic_dedup(emb, id_col, vec_col, tau_e6, n_cells, seed)
    return labeled.filter(~F.col("dropped")).select(id_col)
