"""Vectorized document fingerprinting (rolling k-gram hash).

A 64-bit content fingerprint per document, computed with NumPy over the
*concatenated byte buffer of the whole Arrow batch* — one set of array ops
per batch, no per-document Python loop (the input_hint's "no per-row
Python" mandate):

  1. concatenate all docs' UTF-8 bytes; record offsets
  2. rolling polynomial k-gram hash over the full buffer (k shifted
     multiply-adds, mod 2^64 via uint64 wraparound)
  3. mask grams that straddle a document boundary
  4. per-document segment reduction (np.add.reduceat / minimum.reduceat)
  5. mix (sum, min, count) through splitmix64 -> fingerprint

Distinct texts map to distinct fingerprints with collision probability
~n^2/2^65; document order never matters. Short docs (< k bytes) hash
their zero-padded raw bytes.

Also exposes ``gram_hashes`` (the per-position rolling hashes + segment
ids), reused by the MinHash/SimHash dedup kernels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_P = np.uint64(1099511628211)  # FNV prime as the polynomial base
_SPLITMIX_GAMMA = np.uint64(0x9E3779B97F4A7C15)


def _i64(c: int) -> np.int64:
    """uint64 constant as the int64 with identical bits (for fast SIMD
    multiplies — NumPy's uint64 multiply loop is ~18x slower)."""
    return np.int64(c - (1 << 64) if c >= (1 << 63) else c)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer. Multiplies run in int64 (identical
    wraparound bits); shifts/xors in uint64 (logical shift semantics)."""
    if x.dtype == np.uint64:
        z = x.view(np.int64).copy()
    else:
        z = x.astype(np.int64)
    zi = z
    zu = z.view(np.uint64)
    tmp = np.empty_like(zu)
    # wraparound is the algorithm; silence numpy's scalar-overflow warning
    # (raised only for 0-d inputs, where int64 *= reports instead of wrapping
    # silently as it does for arrays)
    with np.errstate(over="ignore"):
        zi += _i64(0x9E3779B97F4A7C15)
        np.right_shift(zu, np.uint64(30), out=tmp)
        zu ^= tmp
        zi *= _i64(0xBF58476D1CE4E5B9)
        np.right_shift(zu, np.uint64(27), out=tmp)
        zu ^= tmp
        zi *= _i64(0x94D049BB133111EB)
        np.right_shift(zu, np.uint64(31), out=tmp)
        zu ^= tmp
    return zu


def _concat_bytes(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """All docs' bytes as one uint8 vector + int64 offsets (len n+1)."""
    bs = [
        (t if isinstance(t, bytes) else ("" if t is None else str(t)).encode("utf-8"))
        for t in texts
    ]
    lens = np.fromiter((len(b) for b in bs), dtype=np.int64, count=len(bs))
    offsets = np.zeros(len(bs) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    buf = np.frombuffer(b"".join(bs), dtype=np.uint8)
    return buf, offsets


def gram_hashes(
    texts: pd.Series, k: int = 8
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(hashes uint64, doc_idx int64, offsets) for every in-document k-gram.

    Documents shorter than k bytes contribute ONE gram: their zero-padded
    raw bytes.
    """
    buf, offsets = _concat_bytes(texts)
    n_docs = len(offsets) - 1
    total = buf.shape[0]

    if total == 0:
        # every (empty) doc still contributes one zero-padded gram so the
        # all-empty batch agrees with the mixed-batch short-doc path
        return (
            np.zeros(n_docs, dtype=np.uint64),
            np.arange(n_docs, dtype=np.int64),
            offsets,
        )

    # pad so strided slices exist even at the tail. Arithmetic runs in
    # int64: NumPy's uint64 scalar-multiply loop is ~18x slower (no SIMD
    # dispatch), and two's-complement wraparound yields identical low-64
    # bits — we view back to uint64 at the end.
    padded = np.zeros(total + k, dtype=np.int64)
    padded[:total] = buf
    h = np.zeros(total, dtype=np.int64)
    p_i64 = np.int64(_P.astype(np.int64))
    for j in range(k):
        h *= p_i64
        h += padded[j : j + total]
    h = h.view(np.uint64)

    # doc index of each gram-start position
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offsets))
    # a gram starting at i is valid iff it ends inside the same doc
    end = offsets[doc_idx + 1]
    pos = np.arange(total, dtype=np.int64)
    valid = pos + k <= end

    # short docs (< k bytes, incl. empty) -> single zero-padded gram
    doc_lens = np.diff(offsets)
    short = np.flatnonzero(doc_lens < k)
    if short.size:
        sh = np.zeros(short.size, dtype=np.int64)
        for j in range(k):
            p = offsets[short] + j
            inside = p < offsets[short + 1]
            byte = np.where(inside, padded[np.minimum(p, total)], np.int64(0))
            sh = sh * p_i64 + byte
        sh = sh.view(np.uint64)
        h = np.concatenate([h[valid], sh])
        doc_idx = np.concatenate([doc_idx[valid], short.astype(np.int64)])
        order = np.argsort(doc_idx, kind="stable")
        return h[order], doc_idx[order], offsets
    return h[valid], doc_idx[valid], offsets


def doc_fingerprints(texts: pd.Series, k: int = 8) -> np.ndarray:
    """uint64 fingerprint per document (order-sensitive content hash)."""
    h, doc_idx, offsets = gram_hashes(texts, k)
    n_docs = len(offsets) - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    if h.shape[0] == 0:
        return splitmix64(out)
    # finalize each gram hash BEFORE reducing: the raw polynomial hash is
    # linear in the bytes, so a plain sum collapses to a byte-multiset
    # fingerprint (anagram texts collide); splitmix64 breaks the linearity
    g = splitmix64(h)
    # segment starts: first gram index per doc (every doc has >= 1 gram)
    starts = np.searchsorted(doc_idx, np.arange(n_docs, dtype=np.int64))
    s = np.add.reduceat(g, starts)
    mn = np.minimum.reduceat(g, starts)
    cnt = np.diff(np.append(starts, h.shape[0])).astype(np.uint64)
    return splitmix64(s ^ splitmix64(mn) ^ (cnt * _SPLITMIX_GAMMA))
