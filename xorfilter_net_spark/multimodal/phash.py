"""Perceptual-hash near-duplicate detection for media payloads —
block-mean average hash (aHash) and DCT hash (pHash) over decoded pixel
grids as Arrow-batched ``mapInPandas``, then a banded Hamming self-join.

Two signatures, both 64-bit:

- ``ahash64`` (the join default): normalize to an 8x8 block-mean grid,
  bit = block mean > global mean. Stable under small local
  perturbations for ANY spectrum — each bit moves only when a block's
  mean crosses the global mean — so it is the right operating point for
  the deterministic synthetic grids this sandbox can decode (and the
  production baseline real pipelines start from).
- ``phash64``: normalize to 32x32, orthonormal 2-D DCT-II (precomputed
  basis matrix, pure NumPy), median-threshold the low-frequency 8x8
  block. Stronger on natural images with broad spectra; on
  sparse-spectrum synthetic fields the median sits among near-zero
  coefficients and those bits are unstable — which is why it is NOT the
  default here (measured: planted tiny-noise variants landed at
  Hamming ~20 under pHash vs <=3 under aHash on the same corpus).

Every mathematical stage is real; only the codec behind ``decode_media``
is the sandbox stub (multimodal/media.py — ``fake_smooth`` preserves
payload locality so byte-level near-duplicates decode to near-identical
grids).

The pair join reuses the SimHash band-blocking machinery
(dedup/simhash.py::banded_hamming_pairs): 64-bit signatures split into B
chunks, pairs within distance < B share a chunk (pigeonhole — exact
recall for d <= B-1). Signatures are 8 bytes/item regardless of media
size: the join shuffles signatures, never payloads.

No reference counterpart (mandated multimodal family; the similarity
twin of extract_features/resize_media).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..dedup.simhash import banded_hamming_pairs
from .media import decode_media

__all__ = ["ahash64", "phash64", "perceptual_hashes", "phash_near_pairs"]

_N = 32  # pHash normalized grid
_K = 8   # pHash low-frequency block


def _dct_basis(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (n x n)."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    b = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    b[0] /= np.sqrt(2.0)
    return b


_BASIS = _dct_basis(_N)


def _pack_bits(bits: np.ndarray) -> int:
    return int(
        (bits.astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum()
    )


def ahash64(px: np.ndarray) -> int:
    """Block-mean average hash of a 2-D uint8 grid."""
    h, w = px.shape
    g = px.astype(np.float64)
    bh, bw = h // 8, w // 8
    if bh and bw:
        g = g[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    else:  # tiny grids: nearest-neighbor sample
        iy = (np.arange(8) * h) // 8
        ix = (np.arange(8) * w) // 8
        g = g[np.ix_(iy, ix)]
    return _pack_bits((g > g.mean()).reshape(-1))


def phash64(px: np.ndarray) -> int:
    """DCT perceptual hash of a 2-D uint8 grid."""
    iy = (np.arange(_N) * px.shape[0]) // _N
    ix = (np.arange(_N) * px.shape[1]) // _N
    g = px[np.ix_(iy, ix)].astype(np.float64)
    coef = _BASIS @ g @ _BASIS.T
    low = coef[:_K, :_K].reshape(-1)
    med = np.median(low[1:])  # DC term excluded from the threshold
    return _pack_bits(low > med)


_ALGOS = {"ahash": ahash64, "phash": phash64}


def perceptual_hashes(
    media: DataFrame,
    payload_col: str = "payload",
    codec: str = "fake_smooth",
    algo: str = "ahash",
) -> DataFrame:
    """(media_id, phash long) — one 64-bit signature per media row."""
    fn = _ALGOS[algo]

    def gen(batches):
        for pdf in batches:
            hashes = np.array(
                [
                    fn(decode_media(bytes(p), int(w), int(h), codec))
                    for p, w, h in zip(
                        pdf[payload_col], pdf["width"], pdf["height"]
                    )
                ],
                dtype=np.uint64,
            ).view(np.int64)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "phash": hashes}
            )

    return media.select(
        "media_id", payload_col, "width", "height"
    ).mapInPandas(gen, schema="media_id long, phash long")


def phash_near_pairs(
    media: DataFrame,
    max_distance: int = 3,
    bands: int = 4,
    payload_col: str = "payload",
    codec: str = "fake_smooth",
    algo: str = "ahash",
) -> DataFrame:
    """(id_a, id_b, distance) media pairs with Hamming(signature) <=
    max_distance; exact recall for max_distance <= bands-1."""
    sigs = perceptual_hashes(media, payload_col, codec, algo)
    return banded_hamming_pairs(
        sigs, "media_id", "phash", max_distance, bands
    )
