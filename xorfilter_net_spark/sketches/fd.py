"""Mergeable Frequent Directions matrix sketch (north_rule family extension).

Deterministic low-rank summary of a tall matrix A (the embeddings table:
one row per vector): an ``ell x d`` matrix B such that

    0  <=  x' (A'A - B'B) x  <=  2 ||A||_F^2 / ell   for every unit x

i.e. ``A'A >= B'B`` (never overestimates any direction's energy) and the
spectral error is bounded by ``2||A||_F^2/ell`` (Liberty, KDD'13;
Ghashami-Liberty-Phillips-Woodruff, SIAM J. Comput. 2016 — and the
bound survives ARBITRARY merge trees, Agarwal et al. "Mergeable
Summaries", PODS'12-style merge = concatenate rows + one shrink). This
is the one-pass, shuffle-one-state-per-partition way to get principal
directions / covariance structure of a 100 TB embedding corpus: exact
PCA needs a d x d Gram accumulation over every row; FD needs ``ell``
rows per partition crossing the wire.

Shrink step: SVD of the (<= 2*ell)-row buffer, subtract the ell-th
squared singular value from all of them (soft-threshold), keep the
top-(ell-1) nonzero directions. With fewer than ``buffer`` total rows
nothing ever shrinks and B'B == A'A exactly (tested).

No reference counterpart (membership-only library); included because
the north_rule mandates a general mergeable-sketch surface and FD is
the canonical deterministic matrix member of that family.
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd


class FrequentDirections:
    def __init__(self, ell: int = 32, d: int = 64, vec_col: str | None = None):
        if ell < 2:
            raise ValueError(f"ell must be >= 2, got {ell}")
        self.ell = ell
        self.d = d
        self.vec_col = vec_col
        self._cap = 2 * ell

    # state: (rows: (m, d) float64 with m <= 2*ell, fro2: float total
    # squared Frobenius mass of everything ever absorbed)
    def zero(self):
        return (np.zeros((0, self.d), dtype=np.float64), 0.0)

    def _shrink(self, rows: np.ndarray) -> np.ndarray:
        """One FD shrink: soft-threshold singular values by the ell-th."""
        if len(rows) < self._cap:
            return rows
        _, s, vt = np.linalg.svd(rows, full_matrices=False)
        delta = s[self.ell - 1] ** 2 if len(s) >= self.ell else 0.0
        s2 = np.maximum(s**2 - delta, 0.0)
        keep = s2 > 0
        return np.sqrt(s2[keep])[:, None] * vt[keep]

    def _absorb(self, rows: np.ndarray, new: np.ndarray) -> np.ndarray:
        """Append ``new`` in buffer-capacity slices, shrinking as we go."""
        i = 0
        while i < len(new):
            take = self._cap - len(rows)
            rows = np.vstack([rows, new[i : i + take]])
            i += take
            rows = self._shrink(rows)
        return rows

    def update(self, state, pdf: pd.DataFrame):
        rows, fro2 = state
        col = self.vec_col or pdf.columns[0]
        new = np.stack(pdf[col].to_numpy()).astype(np.float64)
        if new.shape[1] != self.d:
            raise ValueError(f"expected dim {self.d}, got {new.shape[1]}")
        return self._absorb(rows, new), fro2 + float((new**2).sum())

    def merge(self, a, b):
        ra, fa = a
        rb, fb = b
        # absorb the shorter buffer into the longer — fewer shrink SVDs
        if len(ra) < len(rb):
            ra, rb = rb, ra
        return self._absorb(ra, rb), fa + fb

    def serialize(self, state) -> bytes:
        rows, fro2 = state
        return pickle.dumps((self.ell, self.d, rows.tobytes(), rows.shape, fro2))

    def deserialize(self, blob: bytes):
        ell, d, raw, shape, fro2 = pickle.loads(blob)
        assert (ell, d) == (self.ell, self.d), "merging incompatible FD dims"
        return np.frombuffer(raw, dtype=np.float64).reshape(shape).copy(), fro2

    def finish(self, state) -> np.ndarray:
        """The sketch matrix B (<= 2*ell rows, d cols)."""
        return state[0]

    def cov_error_bound(self, state) -> float:
        """Published spectral bound on ||A'A - B'B||_2: 2*||A||_F^2/ell."""
        return 2.0 * state[1] / self.ell

    def gram(self, state) -> np.ndarray:
        rows, _ = state
        return rows.T @ rows
