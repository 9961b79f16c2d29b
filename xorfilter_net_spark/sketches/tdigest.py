"""Mergeable t-digest (quantiles with tail accuracy; north_rule family).

Merging t-digest with the k1 scale function
``k(q) = (delta / 2pi) * asin(2q - 1)`` (Dunning & Ertl). Our compression
pass is fully vectorized: sorted (mean, weight) points are assigned to
``floor(k(q_mid))`` buckets and each bucket collapses to its weighted
mean — the same scale-function size bound (<= ~delta/2 + 2 centroids,
fine near the tails, coarse in the middle), deterministic, and NumPy-only.

Merge = concatenate + compress. Like every t-digest, merge is associative
only up to the accuracy bound (centroid boundaries depend on merge order);
the *estimates* agree within bound under any partitioning, which is what
the property tests assert. Min/max are tracked exactly so q→0/1 are exact.

Validation baseline: exact quantiles at test scale (no Spark built-in
t-digest exists).
"""

from __future__ import annotations

import math
import pickle
from dataclasses import dataclass, field

import numpy as np
import pandas as pd


@dataclass
class TDigestState:
    means: np.ndarray = field(default_factory=lambda: np.empty(0, dtype=np.float64))
    weights: np.ndarray = field(default_factory=lambda: np.empty(0, dtype=np.float64))
    n: float = 0.0
    vmin: float = math.inf
    vmax: float = -math.inf


class TDigestSketch:
    def __init__(self, delta: float = 200.0, value_col: str | None = None):
        self.delta = delta
        self.value_col = value_col

    def zero(self) -> TDigestState:
        return TDigestState()

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> tuple:
        if means.size == 0:
            return means, weights
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        cum = np.cumsum(weights) - weights / 2.0
        q = np.clip(cum / total, 1e-12, 1 - 1e-12)
        k = (self.delta / (2.0 * math.pi)) * np.arcsin(2.0 * q - 1.0)
        bucket = np.floor(k).astype(np.int64)
        bucket -= bucket.min()
        nb = int(bucket.max()) + 1
        w_out = np.zeros(nb, dtype=np.float64)
        wm_out = np.zeros(nb, dtype=np.float64)
        np.add.at(w_out, bucket, weights)
        np.add.at(wm_out, bucket, weights * means)
        keep = w_out > 0
        return wm_out[keep] / w_out[keep], w_out[keep]

    def update(self, st: TDigestState, pdf: pd.DataFrame) -> TDigestState:
        col = self.value_col or pdf.columns[0]
        v = pdf[col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return st
        means = np.concatenate([st.means, v])
        weights = np.concatenate([st.weights, np.ones(v.size)])
        st.means, st.weights = self._compress(means, weights)
        st.n += float(v.size)
        st.vmin = min(st.vmin, float(v.min()))
        st.vmax = max(st.vmax, float(v.max()))
        return st

    def merge(self, a: TDigestState, b: TDigestState) -> TDigestState:
        means, weights = self._compress(
            np.concatenate([a.means, b.means]),
            np.concatenate([a.weights, b.weights]),
        )
        return TDigestState(
            means=means,
            weights=weights,
            n=a.n + b.n,
            vmin=min(a.vmin, b.vmin),
            vmax=max(a.vmax, b.vmax),
        )

    def serialize(self, st: TDigestState) -> bytes:
        return pickle.dumps(
            (self.delta, st.means.tobytes(), st.weights.tobytes(), st.n, st.vmin, st.vmax)
        )

    def deserialize(self, blob: bytes) -> TDigestState:
        delta, m, w, n, vmin, vmax = pickle.loads(blob)
        assert delta == self.delta, "merging incompatible t-digest delta"
        return TDigestState(
            means=np.frombuffer(m, dtype=np.float64).copy(),
            weights=np.frombuffer(w, dtype=np.float64).copy(),
            n=n,
            vmin=vmin,
            vmax=vmax,
        )

    def quantile(self, st: TDigestState, q: float) -> float:
        if st.n == 0:
            return math.nan
        if q <= 0:
            return st.vmin
        if q >= 1:
            return st.vmax
        m, w = st.means, st.weights
        if m.size == 1:
            return float(m[0])
        cum = np.cumsum(w) - w / 2.0
        target = q * w.sum()
        i = int(np.searchsorted(cum, target))
        if i == 0:
            lo_v, lo_c, hi_v, hi_c = st.vmin, 0.0, m[0], cum[0]
        elif i >= m.size:
            lo_v, lo_c, hi_v, hi_c = m[-1], cum[-1], st.vmax, w.sum()
        else:
            lo_v, lo_c, hi_v, hi_c = m[i - 1], cum[i - 1], m[i], cum[i]
        if hi_c == lo_c:
            return float(lo_v)
        frac = (target - lo_c) / (hi_c - lo_c)
        return float(lo_v + frac * (hi_v - lo_v))
