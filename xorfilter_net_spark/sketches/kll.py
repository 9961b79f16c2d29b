"""Mergeable KLL sketch (streaming quantiles; north_rule family).

Karnin-Lang-Liberty compactor hierarchy over float64 values: level h holds
items of weight 2^h; a full level sorts itself and promotes every other
item (deterministically seeded offset) to level h+1. Rank error is
O(1/k) * sqrt(log(1/delta)) for sketch size O(k) — with k=200 the
empirical 99th-percentile rank error is well under 1%.

Determinism: compaction offsets come from splitmix64(seed, counter) — the
same data partitioned the same way reproduces the same sketch; merges of
different partitionings agree within the published rank-error bound
(property-tested, not bit-equal — inherent to KLL).

Validation baselines: exact quantiles and Spark's ``percentile_approx``
(Greenwald-Khanna — a different algorithm, used as a sanity oracle).
"""

from __future__ import annotations

import math
import pickle
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from ..kernels.hashes import splitmix64

_C = 2.0 / 3.0


@dataclass
class KllState:
    levels: list = field(default_factory=list)  # list[np.ndarray float64]
    n: int = 0
    counter: int = 0  # compactions so far -> deterministic offsets
    vmin: float = math.inf
    vmax: float = -math.inf


class KllSketch:
    def __init__(self, k: int = 200, value_col: str | None = None, seed: int = 7):
        self.k = k
        self.value_col = value_col
        self.seed = seed

    def zero(self) -> KllState:
        return KllState(levels=[np.empty(0, dtype=np.float64)])

    def _cap(self, h: int, num_levels: int) -> int:
        return max(2, int(math.ceil(self.k * (_C ** (num_levels - 1 - h)))))

    def _offset_bit(self, st: KllState) -> int:
        bit = int(splitmix64(np.uint64((self.seed << 32) ^ st.counter)) & np.uint64(1))
        st.counter += 1
        return bit

    def _compact(self, st: KllState) -> None:
        while True:
            H = len(st.levels)
            total_cap = sum(self._cap(h, H) for h in range(H))
            if sum(a.size for a in st.levels) <= total_cap:
                return
            for h in range(H):
                if st.levels[h].size > self._cap(h, H):
                    arr = np.sort(st.levels[h])
                    off = self._offset_bit(st)
                    promoted = arr[off::2]
                    st.levels[h] = np.empty(0, dtype=np.float64)
                    if h + 1 == H:
                        st.levels.append(promoted)
                    else:
                        st.levels[h + 1] = np.concatenate(
                            [st.levels[h + 1], promoted]
                        )
                    break
            else:
                return

    def update(self, st: KllState, pdf: pd.DataFrame) -> KllState:
        col = self.value_col or pdf.columns[0]
        v = pdf[col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return st
        st.levels[0] = np.concatenate([st.levels[0], v])
        st.n += int(v.size)
        st.vmin = min(st.vmin, float(v.min()))
        st.vmax = max(st.vmax, float(v.max()))
        self._compact(st)
        return st

    def merge(self, a: KllState, b: KllState) -> KllState:
        out = KllState(
            n=a.n + b.n,
            counter=a.counter + b.counter,
            vmin=min(a.vmin, b.vmin),
            vmax=max(a.vmax, b.vmax),
        )
        H = max(len(a.levels), len(b.levels))
        out.levels = []
        for h in range(H):
            xs = []
            if h < len(a.levels):
                xs.append(a.levels[h])
            if h < len(b.levels):
                xs.append(b.levels[h])
            out.levels.append(
                np.concatenate(xs) if xs else np.empty(0, dtype=np.float64)
            )
        self._compact(out)
        return out

    def serialize(self, st: KllState) -> bytes:
        return pickle.dumps(
            (self.k, [a.tobytes() for a in st.levels], st.n, st.counter, st.vmin, st.vmax)
        )

    def deserialize(self, blob: bytes) -> KllState:
        k, raw, n, counter, vmin, vmax = pickle.loads(blob)
        assert k == self.k, "merging incompatible KLL k"
        return KllState(
            levels=[np.frombuffer(r, dtype=np.float64).copy() for r in raw],
            n=n,
            counter=counter,
            vmin=vmin,
            vmax=vmax,
        )

    # -- queries ------------------------------------------------------------
    def _weighted_items(self, st: KllState) -> tuple[np.ndarray, np.ndarray]:
        vals = np.concatenate([a for a in st.levels if a.size])
        wts = np.concatenate(
            [
                np.full(a.size, 2.0**h, dtype=np.float64)
                for h, a in enumerate(st.levels)
                if a.size
            ]
        )
        order = np.argsort(vals, kind="stable")
        return vals[order], wts[order]

    def quantile(self, st: KllState, q: float) -> float:
        if st.n == 0:
            return math.nan
        if q <= 0:
            return st.vmin
        if q >= 1:
            return st.vmax
        vals, wts = self._weighted_items(st)
        cum = np.cumsum(wts)
        target = q * cum[-1]
        i = int(np.searchsorted(cum, target))
        return float(vals[min(i, vals.size - 1)])

    def rank(self, st: KllState, x: float) -> float:
        """Estimated normalized rank of x (fraction of items <= x)."""
        if st.n == 0:
            return math.nan
        vals, wts = self._weighted_items(st)
        total = wts.sum()
        return float(wts[vals <= x].sum() / total)
