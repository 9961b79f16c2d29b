"""Mergeable integer moment summary (n, Σq, Σq²) — the degenerate
member of the sketch family: three exact counters whose merge is plain
addition, quantizing values to integer units so sums are exact,
associative, and bit-identical under any partitioning (the same
convention as the anomaly/trend operators in relational/timeseries.py,
which consume exactly these moments).

Why it exists as a *sketch*: expressing the moments through the
MergeableSketch protocol lets every piece of state machinery in the
repo — `aggregate_by_group`, sketch-column rollups, the streaming
period store with its exactly-once ledger — carry variance/mean state
with zero new plumbing. ``streaming/rolling.py`` uses it to maintain
the 3-sigma anomaly monitor's per-period moment table under a stream.
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd

__all__ = ["MomentSketch"]


class MomentSketch:
    """State: (n, sum_q, sumsq_q) with q = floor(value * quant) — the
    identical single-IEEE-op quantization the SQL operators use, so
    sketch-built moments equal codegen-built ones integer for integer."""

    def __init__(self, quant: int = 1000, value_col: str | None = None):
        if quant <= 0:
            raise ValueError("quant must be positive")
        self.quant = quant
        self.value_col = value_col

    def zero(self):
        return (0, 0, 0)

    def update(self, state, pdf: pd.DataFrame):
        n, s1, s2 = state
        col = self.value_col or pdf.columns[0]
        v = pd.to_numeric(pdf[col], errors="coerce").to_numpy(
            dtype=np.float64
        )
        v = v[~np.isnan(v)]
        if v.size == 0:
            return state
        q = np.floor(v * self.quant).astype(np.int64)
        # python-int accumulation: immune to int64 overflow at any scale
        return (
            n + int(q.size),
            s1 + int(q.sum(dtype=object)),
            s2 + int((q.astype(object) * q.astype(object)).sum()),
        )

    def merge(self, a, b):
        return (a[0] + b[0], a[1] + b[1], a[2] + b[2])

    def serialize(self, state) -> bytes:
        return pickle.dumps((self.quant, state))

    def deserialize(self, blob: bytes):
        quant, state = pickle.loads(blob)
        assert quant == self.quant, "merging incompatible quantizations"
        return state

    def finish(self, state):
        return {"n": state[0], "sum_q": state[1], "sumsq_q": state[2]}

    def estimate(self, state) -> int:
        """Row count (the protocol's scalar finisher role)."""
        return state[0]
