"""Cuckoo filter: the deletable member of the XOR-family comparison triad.

The reference's own paper citation is "Xor Filters: Faster and Smaller
Than Bloom and **Cuckoo** Filters" (reference README.md:18,121 citing
arXiv:1912.08258) — the cuckoo filter (Fan, Andersen, Kaminsky,
Mitzenmacher, "Cuckoo Filter: Practically Better Than Bloom", CoNEXT
2014) is the third structure in that comparison. This module implements
it so the library can reproduce the paper's triad on one corpus:

- **XOR/fuse**: static, smallest (~1.23n / ~1.125n L-bit slots);
- **Bloom / counting Bloom**: mergeable (OR / counter-add), bigger;
- **Cuckoo**: deletable with O(1) insert/delete, ~``f/α`` bits/key at
  load factor α (≈0.95 at bucket size 4 — CoNEXT'14 §5.1), FPR ≤
  ``2b/2^f`` for b slots/bucket.

Geometry (partial-key cuckoo hashing, CoNEXT'14 §3.1): ``m`` (power of
two) buckets × ``b=4`` slots of ``f=16``-bit fingerprints; a key's two
candidate buckets are ``i1 = d0 & (m-1)`` and ``i2 = i1 ^ (h(fp) & (m-1))``
— the XOR form is self-inverse, so EITHER bucket index plus the stored
fingerprint recovers the other. That property gives both eviction (kick a
fingerprint to its alternate bucket) and entry-level re-insertion, which
is how two cuckoo states merge: walk the smaller table's occupied slots
and re-insert ``(bucket, fp)`` pairs. Membership answers are
insert-order independent; the physical slot layout is NOT canonical
(unlike the XOR/Bloom artifacts) — documented, and the tests assert the
semantic contract, not byte identity.

Construction is vectorized round-based bulk insertion: every pending key
scatters into its current candidate bucket by rank-within-bucket against
free capacity (pure NumPy, no per-key Python in the common path); keys
still pending after the alternating rounds fall back to the classic
per-key eviction walk (a small tail below ~0.9 load). Deletion removes
exactly one matching fingerprint occurrence and requires delete ⊆ insert
(same precondition as the counting Bloom filter, sketches/cbf.py).
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass

import numpy as np

from ..kernels.hashes import digest128, pack_bytes, splitmix64

_U64 = np.uint64

BUCKET_SLOTS = 4
MAX_KICKS = 500

__all__ = ["CuckooFilter", "build_cuckoo_from_digests", "build_cuckoo_from_bytes"]


def _fingerprints(d1: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprints (0 is the empty-slot sentinel)."""
    fp = (d1.astype(_U64) & _U64(0xFFFF)).astype(np.uint16)
    return np.where(fp == 0, np.uint16(1), fp)


def _alt_bucket(bucket: np.ndarray, fp: np.ndarray, m: int) -> np.ndarray:
    """i ^ (h(fp) & (m-1)) — self-inverse partial-key step (m power of 2)."""
    h = splitmix64(fp.astype(_U64)) & _U64(m - 1)
    return (bucket.astype(_U64) ^ h).astype(np.int64)


@dataclass
class CuckooFilter:
    m: int  # bucket count, power of two
    table: np.ndarray  # (m, BUCKET_SLOTS) uint16, 0 = empty
    n_items: int

    # -- queries --------------------------------------------------------------
    def contains_digests(self, d0: np.ndarray, d1: np.ndarray) -> np.ndarray:
        fp = _fingerprints(d1)
        i1 = (d0.astype(_U64) & _U64(self.m - 1)).astype(np.int64)
        i2 = _alt_bucket(i1, fp, self.m)
        return ((self.table[i1] == fp[:, None]).any(axis=1)) | (
            (self.table[i2] == fp[:, None]).any(axis=1)
        )

    def contains_bytes(self, values) -> np.ndarray:
        buf, lens = pack_bytes(values)
        d0, d1 = digest128(buf, lens)
        return self.contains_digests(d0, d1)

    # -- mutation -------------------------------------------------------------
    def delete_digests(self, d0: np.ndarray, d1: np.ndarray) -> None:
        """Remove ONE matching fingerprint occurrence per key. Requires
        every deleted key to have been inserted (CoNEXT'14 §3.3) — raises
        if a key has no stored fingerprint in either candidate bucket."""
        fp = _fingerprints(d1)
        i1 = (d0.astype(_U64) & _U64(self.m - 1)).astype(np.int64)
        i2 = _alt_bucket(i1, fp, self.m)
        for k in range(d0.shape[0]):
            f = fp[k]
            done = False
            for b in (int(i1[k]), int(i2[k])):
                row = self.table[b]
                hit = np.flatnonzero(row == f)
                if hit.size:
                    row[hit[0]] = 0
                    done = True
                    break
            if not done:
                raise ValueError(
                    "delete of a key that is not in the filter "
                    "(cuckoo deletes require delete ⊆ insert)"
                )
        self.n_items -= d0.shape[0]

    def delete_bytes(self, values) -> None:
        buf, lens = pack_bytes(values)
        d0, d1 = digest128(buf, lens)
        self.delete_digests(d0, d1)

    # -- state ----------------------------------------------------------------
    @property
    def load_factor(self) -> float:
        return float((self.table != 0).sum()) / (self.m * BUCKET_SLOTS)

    @property
    def bits_per_key(self) -> float:
        return self.m * BUCKET_SLOTS * 16 / max(self.n_items, 1)

    def fpr_bound(self) -> float:
        """CoNEXT'14 §3.1: ≤ 2b/2^f (two buckets × b slots, f-bit tags)."""
        return 2 * BUCKET_SLOTS / 65536.0

    def serialize(self) -> bytes:
        return pickle.dumps((self.m, self.n_items, self.table.tobytes()))

    @classmethod
    def deserialize(cls, blob: bytes) -> "CuckooFilter":
        m, n, raw = pickle.loads(blob)
        table = np.frombuffer(raw, dtype=np.uint16).reshape(m, BUCKET_SLOTS).copy()
        return cls(m, table, n)

    def merge_from(self, other: "CuckooFilter") -> None:
        """Re-insert every occupied slot of ``other`` (same geometry).
        The XOR bucket step is self-inverse, so (bucket, fp) is a
        complete entry description. Raises if combined load exceeds what
        eviction can place."""
        if other.m != self.m:
            raise ValueError("geometry mismatch")
        bkt, slot = np.nonzero(other.table)
        fps = other.table[bkt, slot]
        _bulk_place(self.table, fps.copy(), bkt.astype(np.int64), self.m)
        self.n_items += other.n_items


def _bulk_place(
    table: np.ndarray, fp: np.ndarray, bucket: np.ndarray, m: int
) -> None:
    """Place (fp, bucket) entries — fully vectorized cuckoo rounds.

    Each round: every pending entry scatters into its current candidate
    bucket by rank-within-bucket against free capacity; of the leftovers,
    one entry per full bucket EVICTS a deterministic victim slot (the
    victim re-enters the pending set at its alternate bucket — the
    classic kick, batched), and the rest flip to their alternate bucket.
    This is the same random walk as per-key cuckoo insertion, executed
    breadth-first, so it stays all-NumPy with no per-key Python loop."""
    rounds = 0
    while fp.size:
        if rounds >= MAX_KICKS:
            raise RuntimeError(
                f"cuckoo insertion failed after {MAX_KICKS} rounds "
                f"(load {float((table != 0).sum()) / table.size:.3f}); "
                "resize the filter"
            )
        order = np.lexsort((np.arange(fp.size), bucket))
        bs, fs = bucket[order], fp[order]
        # rank of each entry within its bucket group
        first = np.zeros(bs.size, dtype=bool)
        first[:1] = True
        first[1:] = bs[1:] != bs[:-1]
        gstart = np.maximum.accumulate(np.where(first, np.arange(bs.size), 0))
        rank = np.arange(bs.size) - gstart
        free = BUCKET_SLOTS - (table[bs] != 0).sum(axis=1)
        place = rank < free
        if place.any():
            pb, pf = bs[place], fs[place]
            # scatter each placed entry into its slot: slot index =
            # current occupancy + rank among placed entries of the bucket
            occ = (table[pb] != 0).sum(axis=1)
            pfirst = np.zeros(pb.size, dtype=bool)
            pfirst[:1] = True
            pfirst[1:] = pb[1:] != pb[:-1]
            pstart = np.maximum.accumulate(
                np.where(pfirst, np.arange(pb.size), 0)
            )
            prank = np.arange(pb.size) - pstart
            table[pb, occ + prank] = pf
        rest = ~place
        bs, fs, rank = bs[rest], fs[rest], rank[rest] - free[rest]
        # batched eviction: the first leftover per full bucket kicks a
        # deterministic victim slot; the victim re-enters the walk at its
        # alternate bucket. No RNG anywhere — rebuilds are bit-identical.
        lead = rank == 0
        lb, lf = bs[lead], fs[lead]
        if lb.size:
            v = (splitmix64(lb.view(_U64) + _U64(rounds)) % _U64(BUCKET_SLOTS)).astype(
                np.int64
            )
            victim_fp = table[lb, v].copy()
            table[lb, v] = lf
            ev_bucket = _alt_bucket(lb, victim_fp, m)
        else:
            victim_fp = np.empty(0, dtype=np.uint16)
            ev_bucket = np.empty(0, dtype=np.int64)
        # non-lead leftovers flip to their alternate bucket
        flip_b = _alt_bucket(bs[~lead], fs[~lead], m)
        bucket = np.concatenate([ev_bucket, flip_b])
        fp = np.concatenate([victim_fp, fs[~lead]])
        rounds += 1


def build_cuckoo_from_digests(
    d0: np.ndarray,
    d1: np.ndarray,
    load_target: float = 0.95,
    m: int | None = None,
) -> CuckooFilter:
    """Build from DEDUPLICATED 128-bit digests. ``m`` is the smallest
    power of two with ``n / (4m) <= load_target`` (power-of-two rounding
    means the realized load is in (load_target/2, load_target]); pass
    ``m`` explicitly to pin the geometry (required for ``merge_from``
    between independently built filters)."""
    n = int(d0.shape[0])
    if n == 0:
        raise ValueError("cannot build a cuckoo filter from an empty key set")
    if m is None:
        m = 1
        while m * BUCKET_SLOTS * load_target < n:
            m <<= 1
    elif m & (m - 1):
        raise ValueError("m must be a power of two")
    table = np.zeros((m, BUCKET_SLOTS), dtype=np.uint16)
    fp = _fingerprints(d1)
    i1 = (d0.astype(_U64) & _U64(m - 1)).astype(np.int64)
    _bulk_place(table, fp, i1, m)
    return CuckooFilter(m, table, n)


def build_cuckoo_from_bytes(values, load_target: float = 0.95) -> CuckooFilter:
    buf, lens = pack_bytes(values)
    d0, d1 = digest128(buf, lens)
    pairs = np.unique(np.stack([d0, d1], axis=1), axis=0)
    return build_cuckoo_from_digests(pairs[:, 0], pairs[:, 1], load_target)
