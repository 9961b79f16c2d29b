"""SimHash (Charikar 2002) near-duplicate fingerprints.

64-bit signature per document: bit j of the simhash is the sign of
``sum over gram hashes g of (+1 if bit j of g else -1)``. Similar texts
(high shingle overlap) land within a small Hamming distance; Hamming-
radius search uses band blocking (pigeonhole: distance <= d implies at
least one of d+1 disjoint bands is equal).

Vectorization: one ``np.add.reduceat`` per bit over the batch-wide gram
vector — 64 segmented reductions per Arrow batch, no per-doc Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..text.fingerprint import gram_hashes, splitmix64

SHINGLE_K = 8


def simhash_batch(texts: pd.Series, k: int = SHINGLE_K) -> np.ndarray:
    """int64 simhash per document (bit pattern of the uint64 signature)."""
    h, doc_idx, offsets = gram_hashes(texts, k=k)
    n_docs = len(offsets) - 1
    if h.shape[0] == 0:
        return np.zeros(n_docs, dtype=np.int64)
    # decorrelate bits of the polynomial hash before voting
    g = splitmix64(h)
    starts = np.searchsorted(doc_idx, np.arange(n_docs, dtype=np.int64))
    cnt = np.diff(np.append(starts, g.shape[0]))
    sig = np.zeros(n_docs, dtype=np.uint64)
    one = np.uint64(1)
    for bit in range(64):
        votes = np.add.reduceat((g >> np.uint64(bit)) & one, starts)
        # bit set iff strictly more than half the grams vote 1
        sig |= ((2 * votes > cnt).astype(np.uint64)) << np.uint64(bit)
    return sig.view(np.int64)


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {"id": pdf[id_col], "simhash": simhash_batch(pdf[text_col])}
            )

    return df.select(F.col(id_col), text_col).mapInPandas(
        gen,
        schema=f"id {df.schema[id_col].dataType.simpleString()}, simhash long",
    )


def hamming_expr(a: str, b: str) -> str:
    """Spark SQL popcount of xor (bit_count is built-in since 3.3)."""
    return f"bit_count({a} ^ {b})"


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 12,
    bands: int = 4,
) -> DataFrame:
    """(id_a, id_b, distance) pairs with Hamming(simhash) <= max_distance.

    Blocking: split the 64-bit signature into ``bands`` contiguous chunks;
    a pair within distance d < bands is guaranteed to agree on >= 1 chunk
    (pigeonhole) — exact for d <= bands-1, high-recall heuristic beyond.
    Self-join happens per (band_idx, chunk value), then the exact Hamming
    filter runs JVM-side.
    """
    sigs = simhash_signatures(df, id_col, text_col)
    return banded_hamming_pairs(sigs, "id", "simhash", max_distance, bands)


def banded_hamming_pairs(
    sigs: DataFrame,
    id_col: str,
    sig_col: str,
    max_distance: int,
    bands: int = 4,
) -> DataFrame:
    """(id_a, id_b, distance) pairs from a 64-bit signature table with
    Hamming <= max_distance — the band-blocked self-join shared by
    SimHash text dedup and perceptual-hash media dedup
    (multimodal/phash.py): signatures split into ``bands`` chunks, pairs
    meet on any equal (band_idx, chunk), exact Hamming verified
    JVM-side. Exact recall for max_distance <= bands-1 (pigeonhole)."""
    sigs = sigs.select(F.col(id_col).alias("id"), F.col(sig_col).alias("sig"))
    width = 64 // bands
    chunks = F.array(
        *[
            F.expr(
                f"shiftright(sig, {b * width}) & {(1 << width) - 1}"
            ).cast("long")
            for b in range(bands)
        ]
    )
    ex = sigs.select("id", "sig", F.posexplode(chunks).alias("band_idx", "chunk"))
    a = ex.select(
        F.col("id").alias("id_a"),
        F.col("sig").alias("sig_a"),
        "band_idx",
        "chunk",
    )
    b = ex.select(
        F.col("id").alias("id_b"),
        F.col("sig").alias("sig_b"),
        "band_idx",
        "chunk",
    )
    return (
        a.join(b, ["band_idx", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("distance", F.expr(hamming_expr("sig_a", "sig_b")))
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "distance")
        .dropDuplicates(["id_a", "id_b"])
    )
