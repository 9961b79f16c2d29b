"""FD-based PCA projection — one-pass dimensionality reduction.

Completes the Frequent Directions story (``sketches/fd.py``): the FD
state's top right-singular directions approximate the corpus's
principal components with the Liberty/Ghashami spectral guarantee, so a
100 TB embedding table gets a PCA-style reducer from

1. ONE corpus pass (the mergeable FD aggregate — ``ell`` rows per
   partition cross the wire, never a d×d Gram per row),
2. a driver-side eigendecomposition of the tiny ``ell×d`` state,
3. a map-only broadcast-matrix projection (``mapInPandas``), the same
   embarrassingly-parallel shape as every other scoring stage.

Exact PCA on the same corpus would accumulate the full Gram — also one
pass, but FD additionally survives arbitrary merge trees and bounded
state, which is what streaming/checkpointed pipelines need.

Quality contract (tested + driver-gated): with FD's spectral error
``2‖A‖_F²/ℓ``, the projected subspace captures at least
``(exact top-r energy − 2‖A‖_F²/ℓ)`` of the variance — the gate
compares captured-energy ratios against exact eigendecomposition at
test scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sketches.base import aggregate
from ..sketches.fd import FrequentDirections
from .brute import _stack

__all__ = ["fd_principal_directions", "fd_project"]


def fd_principal_directions(
    emb: DataFrame, vec_col: str, r: int, ell: int = 32, d: int | None = None
) -> np.ndarray:
    """Top-``r`` principal directions (d×r, orthonormal) from one FD pass."""
    if d is None:
        d = len(emb.select(vec_col).first()[0])
    fd = FrequentDirections(ell=ell, d=d, vec_col=vec_col)
    state = aggregate(emb, [vec_col], fd)
    b = fd.finish(state)  # ell x d, B'B ≈ A'A
    # right singular vectors of B = eigvecs of B'B
    _, s, vt = np.linalg.svd(b, full_matrices=False)
    return vt[:r].T.copy()  # d x r


def fd_project(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    r: int = 8,
    ell: int = 32,
    out_col: str = "proj",
) -> DataFrame:
    """(id, proj: array<double>) — rows projected onto the FD top-r
    subspace. The projection matrix is computed once (one corpus pass +
    driver SVD) and captured into a map-only Arrow kernel."""
    w = fd_principal_directions(emb, vec_col, r, ell)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = _stack(pdf[vec_col])
            p = x @ w
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(dtype=np.int64),
                    out_col: list(p.astype(np.float64)),
                }
            )

    return (
        emb.select(F.col(id_col).cast("long").alias(id_col), vec_col)
        .mapInPandas(gen, schema=f"id long, {out_col} array<double>")
        .withColumnRenamed("id", id_col)
    )


def captured_energy_ratio(
    vecs: np.ndarray, w: np.ndarray
) -> float:
    """‖XW‖_F² / ‖X‖_F² — fraction of variance the subspace keeps."""
    total = float((vecs * vecs).sum()) or 1.0
    proj = vecs @ w
    return float((proj * proj).sum()) / total
