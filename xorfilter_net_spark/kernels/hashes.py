"""Vectorized hash kernels (NumPy, no per-row Python in the hot loop).

These are the building blocks of the XOR-filter family, re-expressed for
batch execution over Arrow/NumPy buffers:

- ``murmur3_32``: MurmurHash3 x86 32-bit, the slot-addressing hash the
  reference uses (XORFilter.Net ``BaseXorFilter.cs:147-149``). Implemented
  lane-parallel over a zero-padded ``(n, max_len)`` byte matrix: the block
  loop runs over *columns* (max_len/4 iterations), each iteration vectorized
  across all n rows.
- ``crc32``: the fingerprint hash (reference ``Hashing/Crc32.cs:5``,
  little-endian CRC32 == zlib's reflected 0xEDB88320 polynomial), table-driven
  and column-vectorized the same way.
- ``splitmix64``: our published deterministic seed-derivation chain
  (SURVEY.md §7 D2 — the reference's .NET ``Random`` chain is a runtime
  implementation detail; the *contract* "same seed => identical filter" is
  what we preserve).

All functions are pure: output depends only on (bytes, seed).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "pack_bytes",
    "murmur3_32",
    "murmur3_32_scalar",
    "crc32",
    "splitmix64",
    "xxh64_long",
    "spark_xxhash64_longs",
    "derive_attempt_seeds",
    "digest128",
]

_U32 = np.uint32
_U64 = np.uint64

_C1 = _U32(0xCC9E2D51)
_C2 = _U32(0x1B873593)


def _rotl32(x: np.ndarray, r: int) -> np.ndarray:
    r = _U32(r)
    return (x << r) | (x >> _U32(32 - int(r)))


def pack_bytes(values) -> tuple[np.ndarray, np.ndarray]:
    """Pack a sequence of ``bytes`` into a zero-padded uint8 matrix.

    Returns ``(buf, lens)`` where ``buf`` is ``(n, max_len_padded_to_4)``
    uint8 and ``lens`` the true byte lengths. Single O(total_bytes) copy,
    no per-row Python beyond ``len()``.
    """
    n = len(values)
    lens = np.fromiter((len(v) for v in values), dtype=np.int64, count=n)
    total = int(lens.sum())
    max_len = int(lens.max()) if n else 0
    pad = ((max_len + 3) // 4) * 4 if max_len else 4
    buf = np.zeros((n, pad), dtype=np.uint8)
    if total:
        flat = np.frombuffer(b"".join(values), dtype=np.uint8)
        offsets = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        col_idx = np.arange(total, dtype=np.int64) - np.repeat(offsets, lens)
        buf[row_idx, col_idx] = flat
    return buf, lens


def murmur3_32(
    buf: np.ndarray, lens: np.ndarray, seed: int | np.ndarray
) -> np.ndarray:
    """MurmurHash3 x86_32 over each row of ``buf`` (first ``lens[i]`` bytes).

    ``seed`` may be a scalar or a per-row uint32 array. Vectorized across
    rows; loops only over the (padded) block columns.
    """
    n = buf.shape[0]
    nblocks = buf.shape[1] // 4
    with np.errstate(over="ignore"):
        blocks = (
            buf[:, 0::4].astype(_U32)
            | (buf[:, 1::4].astype(_U32) << _U32(8))
            | (buf[:, 2::4].astype(_U32) << _U32(16))
            | (buf[:, 3::4].astype(_U32) << _U32(24))
        )
        h = np.broadcast_to(np.asarray(seed, dtype=_U32), (n,)).copy()
        nfull = (lens // 4).astype(np.int64)
        tail_len = (lens % 4).astype(np.int64)
        for j in range(nblocks):
            kj = blocks[:, j]
            k1 = kj * _C1
            k1 = _rotl32(k1, 15)
            k1 = k1 * _C2
            full = j < nfull
            hf = h ^ k1
            hf = _rotl32(hf, 13)
            hf = hf * _U32(5) + _U32(0xE6546B64)
            is_tail = (j == nfull) & (tail_len > 0)
            # tail block: padded zeros give exactly the murmur tail k1
            h = np.where(full, hf, np.where(is_tail, h ^ k1, h))
        h ^= lens.astype(_U32)
        h ^= h >> _U32(16)
        h = h * _U32(0x85EBCA6B)
        h ^= h >> _U32(13)
        h = h * _U32(0xC2B2AE35)
        h ^= h >> _U32(16)
    return h


def murmur3_32_scalar(data: bytes, seed: int = 0) -> int:
    """Reference scalar implementation (tests cross-check the batch kernel)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    length = len(data)
    rounded = length & ~3
    for i in range(0, rounded, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[rounded:]
    if tail:
        k = int.from_bytes(tail + b"\x00" * (4 - len(tail)), "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= length
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def _crc_table() -> np.ndarray:
    poly = np.uint32(0xEDB88320)
    tbl = np.arange(256, dtype=_U32)
    with np.errstate(over="ignore"):
        for _ in range(8):
            tbl = np.where(tbl & _U32(1), (tbl >> _U32(1)) ^ poly, tbl >> _U32(1))
    return tbl


_CRC_TBL = _crc_table()


def crc32(buf: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """zlib-compatible CRC32 over each row's first ``lens[i]`` bytes."""
    n = buf.shape[0]
    crc = np.full(n, 0xFFFFFFFF, dtype=_U32)
    max_len = int(lens.max()) if n else 0
    with np.errstate(over="ignore"):
        for j in range(max_len):
            nc = _CRC_TBL[(crc ^ buf[:, j]) & _U32(0xFF)] ^ (crc >> _U32(8))
            crc = np.where(j < lens, nc, crc)
    return crc ^ _U32(0xFFFFFFFF)


def splitmix64(x: np.ndarray | int) -> np.ndarray | int:
    """SplitMix64 finalizer — vectorized over uint64 arrays."""
    with np.errstate(over="ignore"):
        z = np.asarray(x, dtype=_U64) + _U64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        z = z ^ (z >> _U64(31))
    return z


_XXH_P1 = _U64(0x9E3779B185EBCA87)
_XXH_P2 = _U64(0xC2B2AE3D27D4EB4F)
_XXH_P3 = _U64(0x165667B19E3779F9)
_XXH_P4 = _U64(0x85EBCA77C2B2AE63)
_XXH_P5 = _U64(0x27D4EB2F165667C5)
SPARK_XXHASH64_DEFAULT_SEED = 42  # catalyst XxHash64 expression default


def _rotl64(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U64(r)) | (x >> _U64(64 - r))


def xxh64_long(value, seed) -> np.ndarray:
    """XXH64 of a single 64-bit value — bit-exact replica of Spark's
    ``XXH64.hashLong(value, seed)`` (the kernel behind the ``xxhash64``
    SQL builtin on long columns). Vectorized over uint64 arrays; either
    argument may be a scalar. This is what makes the zero-Python SQL probe
    possible: the build kernel addresses slots with exactly the hash the
    JVM can recompute in whole-stage codegen."""
    with np.errstate(over="ignore"):
        v = np.asarray(value, dtype=_U64)
        h = np.asarray(seed, dtype=_U64) + _XXH_P5 + _U64(8)
        h = h ^ (_rotl64(v * _XXH_P2, 31) * _XXH_P1)
        h = _rotl64(h, 27) * _XXH_P1 + _XXH_P4
        h ^= h >> _U64(33)
        h *= _XXH_P2
        h ^= h >> _U64(29)
        h *= _XXH_P3
        h ^= h >> _U64(32)
    return h


def spark_xxhash64_longs(cols) -> np.ndarray:
    """Replica of the Spark SQL ``xxhash64(c1, c2, ...)`` builtin applied
    to non-null long columns: seed 42, then hash chaining
    ``h = hashLong(c_i, h)`` left to right."""
    h = _U64(SPARK_XXHASH64_DEFAULT_SEED)
    for c in cols:
        h = xxh64_long(c, h)
    return h


def derive_attempt_seeds(user_seed: int, attempt: int) -> np.ndarray:
    """Pinned deterministic chain (SURVEY.md §7 D2):

    ``seed_j = splitmix64(splitmix64(user_seed * GOLDEN + attempt) + j)``,
    yielding 3 uint64 seeds per (user_seed, attempt). Same user seed =>
    identical retry sequence => bit-identical filter (the reference's
    determinism contract, DeterministicIntegrationTests.cs:17-34).
    """
    with np.errstate(over="ignore"):
        base = splitmix64(
            _U64(user_seed & 0xFFFFFFFFFFFFFFFF) * _U64(0x9E3779B97F4A7C15)
            + _U64(attempt)
        )
        return splitmix64(np.asarray(base, dtype=_U64) + np.arange(3, dtype=_U64))


def digest128(buf: np.ndarray, lens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """128-bit canonical key digest as two uint64s, built from four
    murmur3_32 lanes with fixed seeds. Used by the scale path so the driver
    peel only ever sees 16 bytes/key regardless of key length."""
    m0 = murmur3_32(buf, lens, 0xD6E8FEB8)
    m1 = murmur3_32(buf, lens, 0x85EBCA6B)
    m2 = murmur3_32(buf, lens, 0xC2B2AE35)
    m3 = murmur3_32(buf, lens, 0x27D4EB2F)
    d0 = (m0.astype(_U64) << _U64(32)) | m1.astype(_U64)
    d1 = (m2.astype(_U64) << _U64(32)) | m3.astype(_U64)
    return d0, d1
