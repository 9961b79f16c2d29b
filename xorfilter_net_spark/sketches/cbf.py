"""Counting Bloom filter: the deletable membership sketch.

The reference's XOR filters are static — "add/remove requires rebuild"
(reference README.md:113) — and our fuse/Bloom variants share that
contract. The counting Bloom filter (Fan et al., "Summary Cache",
IEEE/ACM ToN 2000) closes the gap: each of the k positions holds a
COUNTER instead of a bit, so deleting a previously-inserted key is a
k-way decrement, and membership is "all k counters > 0".

Published contracts this implementation is gated on:
- FPR of the underlying Bloom geometry, ``(1 - e^{-kn/m})^k``, with n =
  live (inserted minus deleted) keys — deletes genuinely reclaim space;
- zero false negatives for inserted-and-not-deleted keys, PROVIDED every
  delete matches a prior insert of the same multiplicity (the classic
  CBF precondition; deleting a never-inserted key can undercount a live
  key's counters — callers enforce delete ⊆ insert, and the events-table
  gate query derives deletes as a strict subset);
- 16-bit counters: the textbook 4-bit-overflow analysis gives
  P(counter > 15) ≈ 1.37e-15·m for optimal k, so uint16 makes overflow
  astronomically unlikely while keeping merge = elementwise ADD exact.

Merge is elementwise counter ADDITION — associative and commutative
(NOT idempotent, unlike the plain Bloom's OR: a CBF is a true multiset
summary, so the two-phase aggregation must feed each row exactly once,
which Spark's mapInPandas-over-partitions shape guarantees).

Deletion composes with the same machinery: build one CBF over the
inserts and one over the deletes (any partitioning), then
``subtract(ins, del)`` — exact because insert counters dominate
delete counters position-by-position when deletes ⊆ inserts.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass

import numpy as np
import pandas as pd

from ..kernels.column import digest_series
from .bloom import optimal_params

_U64 = np.uint64


@dataclass
class CbfState:
    counts: np.ndarray  # uint16, m counters
    n_added: int


class CountingBloomSketch:
    """Two-phase mergeable counting Bloom (zero/update/merge/finish)."""

    def __init__(self, m: int, k: int, key_col: str | None = None):
        self.m = m
        self.k = k
        self.key_col = key_col

    @classmethod
    def for_capacity(cls, expected_n: int, fpp: float = 0.01, key_col=None):
        m, k = optimal_params(expected_n, fpp)
        return cls(m, k, key_col)

    # -- protocol -----------------------------------------------------------
    def zero(self) -> CbfState:
        return CbfState(np.zeros(self.m, dtype=np.uint16), 0)

    def _positions(self, d0: np.ndarray, d1: np.ndarray) -> np.ndarray:
        """(n, k) counter positions via Kirsch-Mitzenmacher double
        hashing on the digest lanes (same geometry as BloomSketch, so
        the published FPR analysis carries over verbatim)."""
        with np.errstate(over="ignore"):
            i = np.arange(self.k, dtype=_U64)
            pos = (d0[:, None] + i[None, :] * (d1 | _U64(1))[:, None]) % _U64(self.m)
        return pos

    def update(self, state: CbfState, pdf: pd.DataFrame) -> CbfState:
        col = self.key_col or pdf.columns[0]
        d0, d1 = digest_series(pdf[col])
        pos = self._positions(d0, d1).ravel().astype(np.int64)
        np.add.at(state.counts, pos, np.uint16(1))
        state.n_added += len(pdf)
        return state

    def merge(self, a: CbfState, b: CbfState) -> CbfState:
        return CbfState(a.counts + b.counts, a.n_added + b.n_added)

    def serialize(self, state: CbfState) -> bytes:
        return pickle.dumps((self.m, self.k, state.n_added, state.counts.tobytes()))

    def deserialize(self, blob: bytes) -> CbfState:
        m, k, n, raw = pickle.loads(blob)
        assert (m, k) == (self.m, self.k), "geometry mismatch"
        return CbfState(np.frombuffer(raw, dtype=np.uint16).copy(), n)

    # -- deletable-membership surface ----------------------------------------
    def subtract(self, ins: CbfState, dele: CbfState) -> CbfState:
        """Apply deletions: counter-wise difference. Requires the delete
        multiset to be a sub-multiset of the inserts (checked cheaply:
        no counter may underflow)."""
        if (dele.counts > ins.counts).any():
            raise ValueError(
                "delete set is not a sub-multiset of the inserts "
                "(some counter would underflow)"
            )
        return CbfState(ins.counts - dele.counts, ins.n_added - dele.n_added)

    def contains(self, state: CbfState, keys: pd.Series) -> np.ndarray:
        d0, d1 = digest_series(keys)
        pos = self._positions(d0, d1).astype(np.int64)
        return (state.counts[pos] > 0).all(axis=1)

    def fpr_bound(self, n_live: int) -> float:
        """Published FPR for n_live keys in this geometry."""
        return (1.0 - np.exp(-self.k * n_live / self.m)) ** self.k
