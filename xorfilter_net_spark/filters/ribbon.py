"""Ribbon filter: the space-optimal static-membership successor in the
XOR-filter family (Dillinger & Walzer, "Ribbon filter: practically
smaller than Bloom and Xor", arXiv:2103.02515; deployed in RocksDB).

The reference library implements only the XOR filter; this module
completes the family's space frontier alongside ``fuse_core.py``:

- XOR (reference, ``BaseXorFilter.cs:31-32``): 1.23n slots;
- binary fuse (``fuse_core.py``): ~1.125n slots;
- **ribbon (this module): ~1.05n slots** — at 10^12 keys x 16 bits,
  another ~150 GB of broadcast state saved vs fuse.

Same membership contract as the rest of the family: zero false
negatives, FPR ~= 2^-L, immutable after build, same-seed determinism.

Construction solves a *banded* linear system over GF(2) instead of
peeling a hypergraph: key k contributes the equation

    ``XOR_{j in bits(c(k))} Z[s(k) + j] = fingerprint(k)``

where ``s(k)`` is a start position and ``c(k)`` a 64-bit coefficient
word with bit 0 forced set. Incremental Gaussian elimination keeps one
pivot row per column; rows only ever move right, so insertion is O(1)
expected and the matrix stays banded (width W=64). Back-substitution
right-to-left yields the solution table Z. Like the XOR/fuse peel
(SURVEY §7 D4), the solve is a *driver/shard-kernel* stage over
deduplicated 128-bit digests — the corpus-sized work (digesting,
dedup) is executor-parallel and identical to the rest of the family.

Trade-off vs fuse, stated honestly: the probe gathers up to W=64
positions per key (vectorized as 64 masked gathers per batch) instead
of 3, and the solve kernel is a sequential Python loop (slower than the
vectorized peel). Ribbon is the broadcast-size-constrained choice; fuse
remains the throughput choice.

Addressing follows SURVEY §7 D2: our own documented deterministic chain
(splitmix64 lanes), not a bit-copy of any C implementation.
"""

from __future__ import annotations

import json
import math
import time
from dataclasses import dataclass, field

import numpy as np

from ..kernels.hashes import (
    derive_attempt_seeds,
    digest128,
    pack_bytes,
    splitmix64,
)
from .xor_core import (
    _DTYPES,
    MAX_RETRIES,
    RETRIES_BEFORE_RESIZE,
    XorConstructionError,
    digest_fingerprint,
)

_U64 = np.uint64

W = 64  # ribbon (band) width: one coefficient machine word
GROWTH = 1.15  # capacity growth on repeated solve failure (mirrors xor_core)

__all__ = ["RibbonFilter", "ribbon_layout", "build_ribbon_from_digests", "build_ribbon_from_bytes"]


def ribbon_layout(n: int, capacity: int | None = None) -> tuple[int, int]:
    """(num_starts, array_length) for n unique keys.

    Standard (non-bumped) ribbon needs a few percent of slack over n for
    the banded system to be solvable w.h.p.; small n needs proportionally
    more (arXiv:2103.02515 §4 — failure odds scale with the band's
    fill). ``num_starts = ceil(n * max(1.05, 1 + 4/sqrt(n)))``; the
    solution table has ``num_starts + W - 1`` entries so every band
    window fits.
    """
    n = max(n, 1)
    if capacity is None:
        factor = max(1.05, 1.0 + 4.0 / math.sqrt(n))
        capacity = int(math.ceil(n * factor))
    num_starts = max(1, capacity)
    return num_starts, num_starts + W - 1


_C_SALT = _U64(0xD6E8FEB86659FD93)


def ribbon_hashes(
    d0: np.ndarray, seed: np.uint64, num_starts: int
) -> tuple[np.ndarray, np.ndarray]:
    """(start, coeff) per digest: start by fastrange on the high 32 bits
    of ``h = splitmix64(d0 ^ seed)``; the coefficient word is an
    independent splitmix lane with bit 0 forced set (every row has a
    leading coefficient, so elimination always terminates)."""
    h = splitmix64(d0.astype(_U64) ^ seed)
    s = (((h >> _U64(32)) * _U64(num_starts)) >> _U64(32)).astype(np.int64)
    c = splitmix64(h ^ _C_SALT) | _U64(1)
    return s, c


def _solve_banded(
    starts: np.ndarray, coeffs: np.ndarray, fps: np.ndarray, m: int
) -> np.ndarray | None:
    """Incremental banded Gaussian elimination + back-substitution.

    Returns the solution table Z (length m) or None when the system is
    inconsistent for this seed (caller retries). Sequential by nature —
    the family's driver/shard kernel stage, like the peel (D4)."""
    rows_c = [0] * m
    rows_b = [0] * m
    for s, c, b in zip(starts.tolist(), coeffs.tolist(), fps.tolist()):
        i = s
        while True:
            tz = (c & -c).bit_length() - 1
            i += tz
            c >>= tz
            rc = rows_c[i]
            if rc == 0:
                rows_c[i] = c
                rows_b[i] = b
                break
            c ^= rc
            b ^= rows_b[i]
            if c == 0:
                if b != 0:
                    return None  # inconsistent: this seed fails
                break  # dependent-but-consistent row: already implied
    z = [0] * m
    for i in range(m - 1, -1, -1):
        c = rows_c[i]
        if c == 0:
            continue
        acc = rows_b[i]
        cc = c & ~1
        while cc:
            p = (cc & -cc).bit_length() - 1
            acc ^= z[i + p]
            cc &= cc - 1
        z[i] = acc
    return np.asarray(z, dtype=_U64)


@dataclass
class RibbonFilter:
    """Immutable built artifact: solution table + one seed per build."""

    width: int
    size: int  # array_length == num_starts + W - 1
    num_starts: int
    seed: np.uint64  # the winning attempt seed
    slots: np.ndarray
    user_seed: int = 0
    attempts: int = 1
    metrics: dict = field(default_factory=dict)
    kind: str = "ribbon64"

    def contains_digests(self, d0: np.ndarray, d1: np.ndarray) -> np.ndarray:
        s, c = ribbon_hashes(d0.astype(_U64), self.seed, self.num_starts)
        acc = np.zeros(d0.shape[0], dtype=_U64)
        slots = self.slots.astype(_U64)
        for j in range(W):
            sel = ((c >> _U64(j)) & _U64(1)).astype(bool)
            if not sel.any():
                continue
            acc[sel] ^= slots[s[sel] + j]
        return acc == digest_fingerprint(d1.astype(_U64), self.width)

    def contains_bytes(self, values) -> np.ndarray:
        buf, lens = pack_bytes(values)
        d0, d1 = digest128(buf, lens)
        return self.contains_digests(d0, d1)

    def to_dict(self) -> dict:
        return {
            "kind": self.kind,
            "width": self.width,
            "size": self.size,
            "num_starts": self.num_starts,
            "seed": int(self.seed),
            "slots_hex": self.slots.tobytes().hex(),
            "user_seed": self.user_seed,
            "attempts": self.attempts,
            "metrics": self.metrics,
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict())

    @classmethod
    def from_dict(cls, d: dict) -> "RibbonFilter":
        slots = np.frombuffer(
            bytes.fromhex(d["slots_hex"]), dtype=_DTYPES[d["width"]]
        ).copy()
        return cls(
            width=d["width"],
            size=d["size"],
            num_starts=d["num_starts"],
            seed=_U64(d["seed"]),
            slots=slots,
            user_seed=d["user_seed"],
            attempts=d.get("attempts", 1),
            metrics=d.get("metrics", {}),
        )

    @classmethod
    def from_json(cls, s: str) -> "RibbonFilter":
        return cls.from_dict(json.loads(s))


def build_ribbon_from_digests(
    d0: np.ndarray,
    d1: np.ndarray,
    width: int = 8,
    seed: int = 0,
    assume_unique: bool = False,
) -> RibbonFilter:
    """Build a ribbon filter from deduplicated 128-bit digests.

    Same retry discipline as the XOR/fuse cores (<=100 fresh seeds per
    size, then grow capacity x1.15, hard cap 1000 attempts — mirroring
    ``BaseXorFilter.cs:35-77``). Same-seed builds are bit-identical
    regardless of the input partitioning (canonicalizing dedup+sort
    unless ``assume_unique``)."""
    if width not in _DTYPES:
        raise ValueError(f"unsupported fingerprint width {width}; use 8, 16 or 32")
    if assume_unique:
        d0u, d1u = d0.astype(_U64), d1.astype(_U64)
    else:
        pairs = np.stack([d0.astype(_U64), d1.astype(_U64)], axis=1)
        pairs = np.unique(pairs, axis=0)
        d0u, d1u = pairs[:, 0], pairs[:, 1]
    n = int(d0u.shape[0])
    if n == 0:
        raise ValueError("cannot build a ribbon filter from an empty key set")

    t0 = time.perf_counter()
    num_starts, array_length = ribbon_layout(n)
    capacity = num_starts
    fp = digest_fingerprint(d1u, width)
    for attempt in range(MAX_RETRIES):
        if attempt > 0 and attempt % RETRIES_BEFORE_RESIZE == 0:
            capacity = math.ceil(capacity * GROWTH)
            num_starts, array_length = ribbon_layout(n, capacity=capacity)
        aseed = derive_attempt_seeds(seed, attempt)[0]
        s, c = ribbon_hashes(d0u, aseed, num_starts)
        z = _solve_banded(s, c, fp, array_length)
        if z is not None:
            return RibbonFilter(
                width=width,
                size=array_length,
                num_starts=num_starts,
                seed=aseed,
                slots=z.astype(_DTYPES[width]),
                user_seed=seed,
                attempts=attempt + 1,
                metrics={
                    "n_keys": n,
                    "table_size": array_length,
                    "num_starts": num_starts,
                    "attempts": attempt + 1,
                    "build_sec": time.perf_counter() - t0,
                    "bits_per_key": array_length * width / n,
                },
            )
    raise XorConstructionError(
        f"ribbon{width} construction failed after {MAX_RETRIES} attempts "
        f"(n={n}, final array_length={array_length})"
    )


def build_ribbon_from_bytes(values, width: int = 8, seed: int = 0) -> RibbonFilter:
    """Build from raw byte keys (local path; content-dedup via digests)."""
    if len(values) == 0:
        raise ValueError("cannot build a ribbon filter from an empty key set")
    buf, lens = pack_bytes(values)
    d0, d1 = digest128(buf, lens)
    return build_ribbon_from_digests(d0, d1, width=width, seed=seed)
