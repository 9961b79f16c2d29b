"""Mergeable HyperLogLog (distinct counting; north_rule family).

Standard HLL (Flajolet et al.): 2^p byte registers; for each key digest,
the top p bits pick a register and the rank (leading-zero count + 1) of
the remaining 64-p bits updates it via max. Merge = elementwise max —
associative, commutative, idempotent. Relative standard error is the
published ``1.04 / sqrt(2^p)``; small cardinalities fall back to linear
counting (the classic bias correction).

Validation baselines: exact ``countDistinct`` and Spark's built-in
``approx_count_distinct`` (HLL++) on the same column.
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd

from ..kernels.column import digest_series

_U64 = np.uint64


def _bitlen_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized integer bit-length (exact — no float round-trip)."""
    x = x.copy()
    n = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = x >= (_U64(1) << _U64(s))
        n[m] += s
        x[m] >>= _U64(s)
    n[x > 0] += 1
    return n


class HllSketch:
    def __init__(self, p: int = 14, key_col: str | None = None):
        assert 4 <= p <= 18
        self.p = p
        self.m = 1 << p
        self.key_col = key_col
        if self.m >= 128:
            self.alpha = 0.7213 / (1 + 1.079 / self.m)
        else:
            self.alpha = {16: 0.673, 32: 0.697, 64: 0.709}[self.m]

    def zero(self) -> np.ndarray:
        return np.zeros(self.m, dtype=np.uint8)

    def update(self, regs: np.ndarray, pdf: pd.DataFrame) -> np.ndarray:
        col = self.key_col or pdf.columns[0]
        d0, _ = digest_series(pdf[col])
        idx = (d0 >> _U64(64 - self.p)).astype(np.int64)
        rest = d0 & ((_U64(1) << _U64(64 - self.p)) - _U64(1))
        rank = (64 - self.p) - _bitlen_u64(rest) + 1  # rest==0 -> max rank
        np.maximum.at(regs, idx, rank.astype(np.uint8))
        return regs

    def merge(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return np.maximum(a, b)

    def serialize(self, regs: np.ndarray) -> bytes:
        """Size-adaptive wire format (HLL++'s sparse idea, Heule et al.
        EDBT'13 §5.3, on the classic register array): a state whose
        nonzero registers are sparse enough ships as (index, rank) pairs
        — 5 bytes per LIVE register instead of 2^p bytes total. Matters
        for per-group sketch-COLUMN tables (``sketches/columns.py``):
        with millions of groups, most groups are small, and state-table
        bytes are what the rollup shuffles and persists. Encoding is a
        pure function of the registers, so equal states serialize
        byte-identically (the rollup byte-identity gate still holds),
        and estimates are EXACTLY those of the dense form — it is the
        same register array, re-encoded."""
        nz = np.flatnonzero(regs)
        if 5 * nz.size <= self.m:
            return pickle.dumps(
                (self.p, ("s", nz.astype(np.int32).tobytes(), regs[nz].tobytes()))
            )
        return pickle.dumps((self.p, regs.tobytes()))

    def deserialize(self, blob: bytes) -> np.ndarray:
        p, payload = pickle.loads(blob)
        assert p == self.p, "merging incompatible HLL precision"
        if isinstance(payload, tuple):  # sparse: ("s", indexes, ranks)
            _, idx_raw, val_raw = payload
            regs = np.zeros(self.m, dtype=np.uint8)
            regs[np.frombuffer(idx_raw, dtype=np.int32)] = np.frombuffer(
                val_raw, dtype=np.uint8
            )
            return regs
        return np.frombuffer(payload, dtype=np.uint8).copy()

    def estimate(self, regs: np.ndarray) -> float:
        m = float(self.m)
        est = self.alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
        if est <= 2.5 * m:
            zeros = int((regs == 0).sum())
            if zeros:
                est = m * np.log(m / zeros)  # linear counting
        return float(est)

    @property
    def rel_std_error(self) -> float:
        return 1.04 / (self.m**0.5)
