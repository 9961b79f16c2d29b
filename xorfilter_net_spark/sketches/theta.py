"""Mergeable Theta/KMV sketch (distinct counting with SET OPERATIONS).

Extends the north_rule sketch family with the one capability HLL lacks:
besides distinct-count and union, a theta sketch supports *intersection*
and *difference* estimates between independently-built sketches — the
workhorse for audience-overlap / key-overlap questions at corpus scale
("how many user_ids did both 'click' and 'purchase'?") without a join.

Construction is bottom-k KMV (k minimum values; Beyer et al., "On
Synopses for Distinct-Value Estimation Under Multiset Operations",
SIGMOD'07; the theta-sketch framing is Dasgupta et al., "Theta-Sketch
Framework", 2016): keep the k smallest *distinct* 64-bit key digests.
State is a sorted ``uint64`` array of ≤ k entries, so

    merge(a, b) = k smallest of (a ∪ b)

is associative, commutative and idempotent — the bottom-k of a union
does not depend on grouping or order (property-tested over random
partition splits in tests/test_sketches.py).

Estimators (theta = normalized k-th minimum; exact mode while < k keys):
    distinct(A)   = (k - 1) / theta_A            (unbiased KMV estimator)
    |A ∩ B|       = |{x ∈ A∩B : x < theta}| / theta,  theta = min(theta_A, theta_B)
    |A \\ B|       = |{x ∈ A,  x ∉ B, x < theta}| / theta
Published error: relative std error ≤ 1/sqrt(k - 2) for the single-set /
union estimate; intersections inherit theta's variance scaled by the
inverse overlap fraction (Dasgupta et al. §4). Below k distinct keys the
sketch *is* the exact distinct set — estimates are exact, which is what
the driver-contract oracle checks value-for-value at test scale.

No reference counterpart (the reference is membership-only); the digest
pipeline is shared with the XOR/Bloom/HLL kernels (kernels/column.py).
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd

from ..kernels.column import digest_series

_U64 = np.uint64
_TWO64 = float(2**64)


class ThetaSketch:
    """Bottom-k KMV sketch over a key column's xxhash64-style digests."""

    def __init__(self, k: int = 4096, key_col: str | None = None):
        assert k >= 16
        self.k = k
        self.key_col = key_col

    # -- MergeableSketch protocol -------------------------------------
    def zero(self) -> np.ndarray:
        return np.empty(0, dtype=_U64)

    def update(self, state: np.ndarray, pdf: pd.DataFrame) -> np.ndarray:
        col = self.key_col or pdf.columns[0]
        d0, _ = digest_series(pdf[col])
        return self._cut(np.union1d(state, d0.astype(_U64)))

    def merge(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return self._cut(np.union1d(a, b))

    def serialize(self, state: np.ndarray) -> bytes:
        return pickle.dumps((self.k, state.tobytes()))

    def deserialize(self, blob: bytes) -> np.ndarray:
        k, raw = pickle.loads(blob)
        assert k == self.k, "merging incompatible theta sketch k"
        return np.frombuffer(raw, dtype=_U64).copy()

    def _cut(self, sorted_unique: np.ndarray) -> np.ndarray:
        return sorted_unique[: self.k]

    # -- estimators ----------------------------------------------------
    def theta(self, state: np.ndarray) -> float:
        """Normalized sampling threshold in (0, 1]; 1.0 = exact mode."""
        if len(state) < self.k:
            return 1.0
        return float(state[-1]) / _TWO64

    def estimate(self, state: np.ndarray) -> float:
        if len(state) < self.k:
            return float(len(state))  # exact mode
        return (self.k - 1) / self.theta(state)

    def _bound_u64(self, state: np.ndarray) -> int | None:
        """Raw uint64 threshold (k-th minimum), or None in exact mode."""
        return int(state[-1]) if len(state) >= self.k else None

    def _cut_both(self, a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray, float]:
        bounds = [x for x in (self._bound_u64(a), self._bound_u64(b)) if x is not None]
        if not bounds:
            return a, b, 1.0
        bound = _U64(min(bounds))  # threshold stays in the integer domain
        return a[a < bound], b[b < bound], float(bound) / _TWO64

    def intersection(self, a: np.ndarray, b: np.ndarray) -> float:
        """|A ∩ B| estimate; exact when both sketches are in exact mode."""
        sa, sb, th = self._cut_both(a, b)
        return len(np.intersect1d(sa, sb, assume_unique=True)) / th

    def a_not_b(self, a: np.ndarray, b: np.ndarray) -> float:
        """|A \\ B| estimate; exact when both sketches are in exact mode."""
        sa, sb, th = self._cut_both(a, b)
        return len(np.setdiff1d(sa, sb, assume_unique=True)) / th

    def union_estimate(self, a: np.ndarray, b: np.ndarray) -> float:
        return self.estimate(self.merge(a, b))

    @property
    def rel_std_error(self) -> float:
        return 1.0 / ((self.k - 2) ** 0.5)
