"""Random-hyperplane (sign) LSH for approximate cosine search — the
scale path when brute force over the full corpus is too expensive.

Signatures: sign bits of ``E @ P.T`` for a deterministic seeded plane
matrix P, packed into ``bands`` keys of ``bits`` bits. Collision
probability per band is ``(1 - theta/pi)^bits`` (Charikar 2002), so
recall is tunable by (bands, bits).

Search: queries and corpus bucket on (band_idx, band_key); candidates
are rows sharing any bucket with a query; exact quantized-cosine rerank
(ann/brute.cosine_e6) produces the final top-k. At 100 TB the bucket
join replaces the corpus-wide scan with a key-partitioned shuffle whose
fan-in per query is ~corpus/2^bits per band.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..text.fingerprint import splitmix64
from .brute import _stack, cosine_e6, quantize


def hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    """Deterministic (n_bits, dim) float64 plane matrix from splitmix64
    counters (uniform in [-1, 1); no library RNG state involved)."""
    n = dim * n_bits
    u = splitmix64(np.arange(n, dtype=np.uint64) + np.uint64(seed * 0x9E3779B1))
    vals = (u.astype(np.float64) / 2**63) - 1.0
    return vals.reshape(n_bits, dim)


def _band_keys(vecs: np.ndarray, planes: np.ndarray, bands: int, bits: int):
    signs = (vecs @ planes.T) >= 0  # (n, bands*bits)
    weights = (1 << np.arange(bits, dtype=np.int64))[None, None, :]
    chunks = signs.reshape(vecs.shape[0], bands, bits).astype(np.int64)
    return (chunks * weights).sum(axis=2)  # (n, bands)


def signature_df(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    planes: np.ndarray,
    bands: int,
    bits: int,
) -> DataFrame:
    """(id, band_idx, band_key) exploded bucket rows, map-only."""

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            keys = _band_keys(_stack(pdf[vec_col]), planes, bands, bits)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "id": np.repeat(pdf[id_col].to_numpy(dtype=np.int64), bands),
                    "band_idx": np.tile(np.arange(bands, dtype=np.int32), n),
                    "band_key": keys.reshape(-1),
                }
            )

    return emb.select(F.col(id_col).cast("long").alias(id_col), vec_col).mapInPandas(
        gen, schema="id long, band_idx int, band_key long"
    )


def lsh_near_dup_pairs(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    tau_e6: int,
    bands: int = 64,
    bits: int = 12,
    seed: int = 7,
    max_bucket_size: int = 2000,
) -> DataFrame:
    """(id_a, id_b, cos_e6) pairs with quantized cosine >= tau_e6.

    Bucket self-join on LSH bands generates candidates; exact rerank
    keeps only true pairs, so precision is exact and recall follows the
    band s-curve (~1 for near-parallel pairs). Oversized buckets are
    dropped instead of exploding quadratically.

    Defaults (64 bands x 12 bits) target near-dup thresholds tau >= 0.8:
    the hardest true pair in the fixture corpus (cos 0.87, theta ~ 29.5
    deg, p_bit = 0.836) collides per band w.p. 0.836^12 = 0.116, so the
    miss probability over 64 bands is (1-0.116)^64 ~ 4e-4, while bulk
    unrelated pairs (theta ~ pi/2, p_bit = 0.5) become candidates w.p.
    1-(1-0.5^12)^64 ~ 1.5% — the candidate volume (and therefore the
    vectors-per-pair join traffic of the exact rerank, the dominant
    stage) is ~4x lower than 10-bit bands for the same output set
    (verified identical at sf0.01 and sf0.1). Shallow 4-bit bands made
    EVERY pair a candidate and pushed the whole n^2 corpus through the
    exact rerank; the plane matrix is seed-deterministic, so recall at a
    given (corpus, seed) is reproducible, not a per-run coin flip.
    """
    dim = len(emb.select(vec_col).first()[0])
    planes = hyperplanes(dim, bands * bits, seed)
    sig = signature_df(emb, id_col, vec_col, planes, bands, bits)
    grouped = sig.groupBy("band_idx", "band_key").agg(
        F.collect_list("id").alias("ids")
    )
    pairs = (
        grouped.filter(
            (F.size("ids") >= 2) & (F.size("ids") <= max_bucket_size)
        )
        .select(F.explode("ids").alias("id_a"), "ids")
        .select("id_a", F.explode("ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )

    vecs = emb.select(F.col(id_col).cast("long").alias("vid"), vec_col).persist()

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            a = quantize(_stack(pdf["va"]))
            b = quantize(_stack(pdf["vb"]))
            dots = (a * b).sum(axis=1)
            na = (a * a).sum(axis=1)
            nb = (b * b).sum(axis=1)
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"],
                    "id_b": pdf["id_b"],
                    "cos_e6": cosine_e6(dots, na, nb),
                }
            )

    joined = (
        pairs.join(
            vecs.select(F.col("vid").alias("id_a"), F.col(vec_col).alias("va")),
            "id_a",
        )
        .join(
            vecs.select(F.col("vid").alias("id_b"), F.col(vec_col).alias("vb")),
            "id_b",
        )
    )
    return (
        joined.mapInPandas(score, schema="id_a long, id_b long, cos_e6 long")
        .filter(F.col("cos_e6") >= tau_e6)
    )


def lsh_topk_cosine(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    bands: int = 16,
    bits: int = 4,
    seed: int = 7,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: bucket join on LSH bands, exact rerank of the
    candidate set. Output schema matches brute.topk_cosine."""
    dim = len(queries[0][1])
    planes = hyperplanes(dim, bands * bits, seed)
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    qmat_f = _stack(pd.Series([q[1] for q in queries]))
    qkeys = _band_keys(qmat_f, planes, bands, bits)
    qmat = quantize(qmat_f)
    qnorm = (qmat * qmat).sum(axis=1)

    # query bucket table is tiny -> broadcast to the corpus-side join
    spark = emb.sparkSession
    qrows = [
        (int(qids[j]), int(b), int(qkeys[j, b]))
        for j in range(len(qids))
        for b in range(bands)
    ]
    qdf = spark.createDataFrame(qrows, "qid long, band_idx int, band_key long")

    sig = signature_df(emb, id_col, vec_col, planes, bands, bits)
    cand = (
        sig.join(F.broadcast(qdf), ["band_idx", "band_key"])
        .select("qid", F.col("id").alias("neighbor_id"))
        .dropDuplicates(["qid", "neighbor_id"])
    )
    if exclude_self:
        cand = cand.filter(F.col("qid") != F.col("neighbor_id"))

    # exact rerank: join candidate ids back to vectors, score vs broadcast
    # query matrix inside a vectorized batch kernel
    qindex = {int(q): j for j, q in enumerate(qids)}

    def rerank(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            emat = quantize(_stack(pdf[vec_col]))
            enorm = (emat * emat).sum(axis=1)
            qj = np.array([qindex[q] for q in pdf["qid"]], dtype=np.int64)
            dots = (emat * qmat[qj]).sum(axis=1)
            scores = cosine_e6(dots, enorm, qnorm[qj])
            yield pd.DataFrame(
                {
                    "qid": pdf["qid"],
                    "neighbor_id": pdf["neighbor_id"],
                    "cos_e6": scores,
                }
            )

    vecs = emb.select(
        F.col(id_col).cast("long").alias("neighbor_id"), vec_col
    )
    scored = cand.join(vecs, "neighbor_id").mapInPandas(
        rerank, schema="qid long, neighbor_id long, cos_e6 long"
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cos_e6").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "neighbor_id", "cos_e6", "rn")
    )
