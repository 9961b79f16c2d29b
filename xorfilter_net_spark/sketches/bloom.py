"""Mergeable Bloom filter (the north_star's baseline membership sketch).

Classic partitioned-free Bloom: m-bit array, k set positions per key via
double hashing ``(h1 + i*h2) mod m`` (Kirsch-Mitzenmacher — preserves the
published FPR ``(1 - e^{-kn/m})^k`` with only two base hashes, both taken
from the key's 128-bit digest lanes). Merge = bitwise OR: associative,
commutative, idempotent — the strongest merge contract in the family.

Validation baseline: ``DataFrame.stat.bloomFilter`` (Spark built-in) on
the same column; ours must agree on zero false negatives and stay within
the same FPR envelope (tests/test_sketches.py).
"""

from __future__ import annotations

import math
import pickle
from dataclasses import dataclass

import numpy as np
import pandas as pd

from ..kernels.column import digest_series

_U64 = np.uint64


def optimal_params(expected_n: int, fpp: float) -> tuple[int, int]:
    """(m_bits, k) minimizing space for a target false-positive rate."""
    m = max(64, int(math.ceil(-expected_n * math.log(fpp) / (math.log(2) ** 2))))
    k = max(1, round(m / max(expected_n, 1) * math.log(2)))
    return m, k


@dataclass
class BloomState:
    bits: np.ndarray  # uint8 bitmap, m/8 bytes
    n_added: int


class BloomSketch:
    def __init__(self, m_bits: int, k: int, key_col: str | None = None):
        if m_bits % 8:
            m_bits += 8 - m_bits % 8
        self.m = m_bits
        self.k = k
        self.key_col = key_col

    @classmethod
    def for_capacity(cls, expected_n: int, fpp: float = 0.01, key_col=None):
        m, k = optimal_params(expected_n, fpp)
        return cls(m, k, key_col)

    # -- protocol -----------------------------------------------------------
    def zero(self) -> BloomState:
        return BloomState(np.zeros(self.m // 8, dtype=np.uint8), 0)

    def _positions(self, d0: np.ndarray, d1: np.ndarray) -> np.ndarray:
        """(n, k) bit positions via double hashing on the digest lanes."""
        with np.errstate(over="ignore"):
            i = np.arange(self.k, dtype=_U64)
            pos = (d0[:, None] + i[None, :] * (d1 | _U64(1))[:, None]) % _U64(self.m)
        return pos

    def update(self, state: BloomState, pdf: pd.DataFrame) -> BloomState:
        col = self.key_col or pdf.columns[0]
        d0, d1 = digest_series(pdf[col])
        pos = self._positions(d0, d1).ravel()
        np.bitwise_or.at(
            state.bits, (pos >> _U64(3)).astype(np.int64),
            np.left_shift(np.uint8(1), (pos & _U64(7)).astype(np.uint8)),
        )
        state.n_added += len(pdf)
        return state

    def merge(self, a: BloomState, b: BloomState) -> BloomState:
        return BloomState(a.bits | b.bits, a.n_added + b.n_added)

    def serialize(self, state: BloomState) -> bytes:
        return pickle.dumps((self.m, self.k, state.n_added, state.bits.tobytes()))

    def deserialize(self, blob: bytes) -> BloomState:
        m, k, n, raw = pickle.loads(blob)
        assert m == self.m and k == self.k, "merging incompatible Bloom params"
        return BloomState(np.frombuffer(raw, dtype=np.uint8).copy(), n)

    # -- queries ------------------------------------------------------------
    def contains(self, state: BloomState, d0: np.ndarray, d1: np.ndarray) -> np.ndarray:
        pos = self._positions(d0, d1)
        byte = state.bits[(pos >> _U64(3)).astype(np.int64)]
        bit = np.left_shift(np.uint8(1), (pos & _U64(7)).astype(np.uint8))
        return ((byte & bit) != 0).all(axis=1)

    def contains_series(self, state: BloomState, s: pd.Series) -> np.ndarray:
        d0, d1 = digest_series(s)
        return self.contains(state, d0, d1)

    def expected_fpp(self, state: BloomState) -> float:
        """(1 - e^{-kn/m})^k with the *actual* fill ratio for n."""
        load = np.unpackbits(state.bits).mean()
        return float(load**self.k)
