"""Mergeable Count-Sketch / AMS sketch (north_rule family extension).

The signed cousin of count-min (``cms.py``): a ``d x w`` counter matrix
where row ``i`` hashes the key digest to a column AND to a +-1 sign, and
adds the sign. Two published estimators ride the same state:

- **Frequency** (Charikar-Chen-Farach-Colton, ICALP'02): estimate =
  median over rows of ``sign_i(x) * C[i, h_i(x)]``. UNBIASED (unlike
  count-min's one-sided overestimate); with ``w = 3/eps^2`` buckets per
  row the error is ``|est - f(x)| <= eps * ||f||_2`` with probability
  ``1 - delta`` for ``d = O(log 1/delta)`` rows. We expose
  ``eps = sqrt(3/w)``.
- **F2 / self-join size** (Alon-Matias-Szegedy, STOC'96 — the count
  sketch IS a bucketed AMS sketch): each row's ``sum(C[i]^2)`` is an
  unbiased estimator of ``F2 = sum_x f(x)^2`` with variance
  ``<= 2*F2^2/w``; the median over ``d`` rows concentrates (Chebyshev +
  Chernoff). F2 is the size of the self-equi-join — the classic
  cardinality-estimation input for join planning.

Merge = elementwise add (signs are pure functions of the key digest, so
partition-parallel two-phase aggregation is exact) — associative and
commutative, property-tested under random partitionings like the rest
of the family (tests/test_sketches.py).

No reference counterpart (the reference is membership-only); included
because the north_rule mandates a general approximate-aggregation
library and frequency/F2 is the canonical signed-sketch member.
"""

from __future__ import annotations

import math
import pickle

import numpy as np
import pandas as pd

from ..kernels.column import digest_series
from ..kernels.hashes import splitmix64

_U64 = np.uint64


class CountSketch:
    def __init__(self, d: int = 7, w: int = 4096, key_col: str | None = None):
        if d < 1 or w < 2:
            raise ValueError(f"need d >= 1, w >= 2; got d={d}, w={w}")
        self.d = d
        self.w = w
        self.key_col = key_col
        self.row_seeds = splitmix64(
            np.arange(d, dtype=_U64) + _U64(0xC5C5_0000_0000_0001)
        )

    @property
    def eps(self) -> float:
        """Frequency error scale: |est - f| <= eps * ||f||_2 w.h.p."""
        return math.sqrt(3.0 / self.w)

    @property
    def f2_rel_sd(self) -> float:
        """Per-row relative std dev of the F2 estimator: sqrt(2/w)."""
        return math.sqrt(2.0 / self.w)

    def zero(self) -> np.ndarray:
        return np.zeros((self.d, self.w), dtype=np.int64)

    def _cols_signs(self, d0: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(d, n) column indices and (d, n) +-1 signs.

        Column uses the low bits, sign the top bit, of one splitmix64
        mix per row — independent enough lanes of an avalanching hash
        (same construction the CMS/theta sketches use for row hashes).
        """
        cols = np.empty((self.d, len(d0)), dtype=np.int64)
        signs = np.empty((self.d, len(d0)), dtype=np.int64)
        for i, s in enumerate(self.row_seeds):
            h = splitmix64(d0 ^ s)
            cols[i] = (h % _U64(self.w)).astype(np.int64)
            signs[i] = 1 - 2 * (h >> _U64(63)).astype(np.int64)
        return cols, signs

    def update(self, state: np.ndarray, pdf: pd.DataFrame) -> np.ndarray:
        col = self.key_col or pdf.columns[0]
        d0, _ = digest_series(pdf[col])
        cols, signs = self._cols_signs(d0)
        for i in range(self.d):
            np.add.at(state[i], cols[i], signs[i])
        return state

    def merge(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return a + b

    def serialize(self, state: np.ndarray) -> bytes:
        return pickle.dumps((self.d, self.w, state.tobytes()))

    def deserialize(self, blob: bytes) -> np.ndarray:
        d, w, raw = pickle.loads(blob)
        assert (d, w) == (self.d, self.w), "merging incompatible CountSketch dims"
        return np.frombuffer(raw, dtype=np.int64).reshape(d, w).copy()

    def estimate_series(self, state: np.ndarray, s: pd.Series) -> np.ndarray:
        """Median-over-rows signed frequency estimates (unbiased)."""
        d0, _ = digest_series(s)
        cols, signs = self._cols_signs(d0)
        ests = np.stack([signs[i] * state[i][cols[i]] for i in range(self.d)])
        return np.median(ests, axis=0)

    def f2(self, state: np.ndarray) -> float:
        """Median-over-rows AMS self-join-size estimate."""
        per_row = (state.astype(np.float64) ** 2).sum(axis=1)
        return float(np.median(per_row))

    def inner_product(self, a: np.ndarray, b: np.ndarray) -> float:
        """Cross-relation equi-join size estimate (Alon-Gibbons-Matias-
        Szegedy, PODS'99 "Tracking join and self-join sizes in limited
        storage"): for two relations sketched with the SAME instance
        (same row seeds), each row's ``sum_w a[i,w] * b[i,w]`` is an
        unbiased estimator of ``|A join B| = sum_x f_A(x) * f_B(x)``
        with variance ``<= 2 * F2(A) * F2(B) / w``; the median over
        ``d`` rows concentrates. This is the classic sketch input to
        join planning: both sides are sketched independently (one pass
        each, mergeable across partitions), the join itself never runs.
        """
        if a.shape != (self.d, self.w) or b.shape != (self.d, self.w):
            raise ValueError("states must come from this sketch's geometry")
        per_row = (a.astype(np.float64) * b.astype(np.float64)).sum(axis=1)
        return float(np.median(per_row))
