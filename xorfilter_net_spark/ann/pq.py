"""Product quantization (PQ) ANN: subspace codebooks + ADC candidate scan.

The fourth similarity-search path beside brute force (``ann/brute.py``,
exact), sign-LSH (``ann/lsh.py``) and IVF (``ann/ivf.py``) — the
compression half of Jegou et al., "Product Quantization for Nearest
Neighbor Search" (TPAMI 2011): split each (unit-normalized) vector into
``m`` subspaces, k-means each subspace into ``n_codes`` centroids, and
store only the per-subspace centroid ids — ``m`` bytes per vector instead
of ``4·dim`` (64-dim float32 → 8 bytes at m=8: 32×). Search uses ADC
(asymmetric distance computation): the query stays exact; a per-query
``m × n_codes`` lookup table of partial dot products turns each stored
code into an approximate cosine with ``m`` table gathers — no decode.

Spark shape, 100 TB-minded:
- *Train*: codebooks fit driver-side on a deterministic hash-sample
  (pushed-down filter; the sample crosses to the driver, the corpus does
  not) — same discipline as ``ivf.train_centroids``. Codebook size is
  ``m · n_codes · dsub`` floats: broadcast material.
- *Encode*: map-only ``mapInPandas`` argmin per subspace against the
  broadcast codebooks; emits ``(id, code: binary)``. The code column is
  what you'd persist: the corpus re-scan for future query batches reads
  m bytes/row, not the embedding.
- *Scan*: the per-query LUTs are tiny and ship in the task closure; each
  partition emits only its LOCAL top-c candidates per query (the same
  map-side-combine shape as ``brute.topk_cosine``), so the shuffle
  carries O(queries · c · partitions) rows, never the corpus.
- *Rerank*: surviving candidates join back to their exact vectors and are
  rescored with the shared quantized-cosine kernel, so the final ranking
  (and its determinism contract) is identical to the other ANN paths.

Determinism: sampling, init and iterations are pure functions of
(seed, m, n_codes, iters); the ADC phase only selects candidates — ties
and float noise there can only affect which candidates are offered to the
exact rerank, and the recall gate measures exactly that.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..text.fingerprint import splitmix64
from .brute import _stack, cosine_e6, quantize
from .ivf import _normalize

__all__ = ["train_codebooks", "encode_pq", "pq_topk_cosine"]


def _det_picks(n: int, k: int, seed: int) -> np.ndarray:
    """k distinct row indices in [0, n) via splitmix counter probing
    (same deterministic-init discipline as ivf.train_centroids)."""
    picks: list[int] = []
    seen: set[int] = set()
    c = 0
    while len(picks) < k:
        r = int(splitmix64(np.uint64(seed * 0x9E3779B1 + c)) % np.uint64(n))
        c += 1
        if r not in seen:
            seen.add(r)
            picks.append(r)
    return np.array(picks, dtype=np.int64)


def train_codebooks(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 10,
    seed: int = 23,
    sample_mod: int = 1,
) -> np.ndarray:
    """(m, n_codes, dim/m) codebooks: L2 k-means per subspace over
    unit-normalized sample vectors (normalizing first makes the summed
    subspace dot products approximate the cosine)."""
    src = emb.select(F.col(id_col).cast("long").alias("id"), vec_col)
    if sample_mod > 1:
        src = src.filter(F.pmod(F.xxhash64("id"), F.lit(sample_mod)) == 0)
    pdf = src.orderBy("id").toPandas()
    x = _normalize(_stack(pdf[vec_col]))
    n, dim = x.shape
    if n == 0:
        raise ValueError("cannot train PQ codebooks on an empty sample")
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    k = min(n_codes, n)
    books = np.zeros((m, k, dsub), dtype=np.float64)
    for j in range(m):
        xs = x[:, j * dsub : (j + 1) * dsub]
        cent = xs[_det_picks(n, k, seed * (j + 1) + j)]
        for _ in range(iters):
            # L2 argmin == argmax(dot - ||c||²/2)
            score = xs @ cent.T - 0.5 * (cent * cent).sum(axis=1)
            assign = np.argmax(score, axis=1)
            for c in range(k):
                sel = assign == c
                if sel.any():
                    cent[c] = xs[sel].mean(axis=0)
        books[j] = cent
    return books


def _encode_mat(x: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) uint8 codes for unit-normalized rows x."""
    m, k, dsub = books.shape
    codes = np.empty((x.shape[0], m), dtype=np.uint8)
    for j in range(m):
        xs = x[:, j * dsub : (j + 1) * dsub]
        score = xs @ books[j].T - 0.5 * (books[j] * books[j]).sum(axis=1)
        codes[:, j] = np.argmax(score, axis=1).astype(np.uint8)
    return codes


def encode_pq(
    emb: DataFrame, id_col: str, vec_col: str, books: np.ndarray
) -> DataFrame:
    """(id, code binary) — map-only encoding against broadcast codebooks;
    the persistable m-bytes-per-vector index."""
    bks = books

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = _normalize(_stack(pdf[vec_col]))
            codes = _encode_mat(x, bks)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(dtype=np.int64),
                    "code": [c.tobytes() for c in codes],
                }
            )

    return emb.select(
        F.col(id_col).cast("long").alias(id_col), vec_col
    ).mapInPandas(gen, schema="id long, code binary")


def pq_topk_cosine(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 10,
    seed: int = 23,
    oversample: int = 5,
    sample_mod: int = 1,
    books: np.ndarray | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: ADC candidate scan over PQ codes, then exact
    rerank of the ``oversample·k`` best candidates per query. Output
    schema matches ``brute.topk_cosine``: (qid, neighbor_id, cos_e6, rn).
    """
    if books is None:
        books = train_codebooks(
            emb, id_col, vec_col, m, n_codes, iters, seed, sample_mod
        )
    mm, kk, dsub = books.shape
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    qmat_f = _stack(pd.Series([q[1] for q in queries]))
    qn = _normalize(qmat_f)
    # per-query ADC lookup tables: lut[q, j, c] = <q_j, book[j, c]>
    lut = np.einsum("qjd,jcd->qjc", qn.reshape(len(qids), mm, dsub), books)
    qmat = quantize(qmat_f)
    qnorm = (qmat * qmat).sum(axis=1)
    c_local = max(k * oversample, k)

    def scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            codes = np.stack(
                [np.frombuffer(b, dtype=np.uint8) for b in pdf["code"]]
            )
            # scores (Q, n): m gathers per query from the LUT
            scores = np.zeros((len(qids), codes.shape[0]), dtype=np.float64)
            for j in range(mm):
                scores += lut[:, j, codes[:, j]]
            take = min(c_local, codes.shape[0])
            out_q, out_i, out_s = [], [], []
            for qi in range(len(qids)):
                idx = np.argpartition(-scores[qi], take - 1)[:take]
                out_q.append(np.full(take, qids[qi], dtype=np.int64))
                out_i.append(ids[idx])
                out_s.append(scores[qi, idx])
            yield pd.DataFrame(
                {
                    "qid": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_i),
                    "adc": np.concatenate(out_s),
                }
            )

    codes_df = encode_pq(emb, id_col, vec_col, books)
    local = codes_df.mapInPandas(
        scan, schema="qid long, neighbor_id long, adc double"
    )
    if exclude_self:
        local = local.filter(F.col("qid") != F.col("neighbor_id"))
    wq = Window.partitionBy("qid").orderBy(
        F.col("adc").desc(), F.col("neighbor_id")
    )
    cand = (
        local.withColumn("crn", F.row_number().over(wq))
        .filter(F.col("crn") <= c_local)
        .select("qid", "neighbor_id")
    )

    # exact rerank — shared quantized-cosine kernel, same as ivf/brute
    qindex = {int(q): j for j, q in enumerate(qids)}

    def rerank(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            emat = quantize(_stack(pdf[vec_col]))
            enorm = (emat * emat).sum(axis=1)
            qj = np.array([qindex[q] for q in pdf["qid"]], dtype=np.int64)
            dots = (emat * qmat[qj]).sum(axis=1)
            yield pd.DataFrame(
                {
                    "qid": pdf["qid"],
                    "neighbor_id": pdf["neighbor_id"],
                    "cos_e6": cosine_e6(dots, enorm, qnorm[qj]),
                }
            )

    vecs = emb.select(F.col(id_col).cast("long").alias("neighbor_id"), vec_col)
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
