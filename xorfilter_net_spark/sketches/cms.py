"""Mergeable Count-Min sketch (frequency estimation; north_rule family).

d x w counter matrix; row i hashes the key digest with an independent
seed. Estimate = min over rows: never an underestimate, overestimates by
at most ``eps * N`` with probability ``1 - delta`` where ``eps = e/w``,
``delta = e^-d`` (Cormode-Muthukrishnan). Merge = elementwise add —
associative and commutative (not idempotent: CMS counts a multiset).

Validation baseline: exact GROUP BY counts and Spark SQL's built-in
``count_min_sketch``.
"""

from __future__ import annotations

import math
import pickle

import numpy as np
import pandas as pd

from ..kernels.column import digest_series
from ..kernels.hashes import splitmix64

_U64 = np.uint64


class CmsSketch:
    def __init__(self, d: int = 5, w: int = 4096, key_col: str | None = None):
        self.d = d
        self.w = w
        self.key_col = key_col
        self.row_seeds = splitmix64(
            np.arange(d, dtype=_U64) + _U64(0xC0C0_0000_0000_0001)
        )

    @classmethod
    def for_error(cls, eps: float, delta: float, key_col=None) -> "CmsSketch":
        w = max(16, int(math.ceil(math.e / eps)))
        d = max(1, int(math.ceil(math.log(1.0 / delta))))
        return cls(d, w, key_col)

    @property
    def eps(self) -> float:
        return math.e / self.w

    @property
    def delta(self) -> float:
        return math.exp(-self.d)

    def zero(self) -> np.ndarray:
        return np.zeros((self.d, self.w), dtype=np.int64)

    def _cols(self, d0: np.ndarray) -> np.ndarray:
        """(d, n) column indices, one independent hash row per seed."""
        return np.stack(
            [
                (splitmix64(d0 ^ s) % _U64(self.w)).astype(np.int64)
                for s in self.row_seeds
            ]
        )

    def update(self, state: np.ndarray, pdf: pd.DataFrame) -> np.ndarray:
        col = self.key_col or pdf.columns[0]
        d0, _ = digest_series(pdf[col])
        cols = self._cols(d0)
        for i in range(self.d):
            np.add.at(state[i], cols[i], 1)
        return state

    def merge(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return a + b

    def serialize(self, state: np.ndarray) -> bytes:
        return pickle.dumps((self.d, self.w, state.tobytes()))

    def deserialize(self, blob: bytes) -> np.ndarray:
        d, w, raw = pickle.loads(blob)
        assert (d, w) == (self.d, self.w), "merging incompatible CMS dims"
        return np.frombuffer(raw, dtype=np.int64).reshape(d, w).copy()

    def estimate_series(self, state: np.ndarray, s: pd.Series) -> np.ndarray:
        d0, _ = digest_series(s)
        cols = self._cols(d0)
        ests = np.stack([state[i][cols[i]] for i in range(self.d)])
        return ests.min(axis=0)
