"""Brute-force cosine top-k over an embedding column — the ANN baseline.

Scale shape: the query set is a small broadcast matrix; each Arrow batch
of the (huge) embedding table computes an int64 matmul against it and
emits only its LOCAL top-k rows per query, so the shuffle that feeds the
global top-k carries O(num_queries * k * num_partitions) rows, never the
corpus. That is the map-side-combine pattern for top-k.

Scoring is *quantized* cosine: components floor-quantized to 1e-3, dot
and norms computed in exact int64, final score
``floor(1e6 * dot / (sqrt(na)*sqrt(nb)))``. Every operation is either
exact integer math or a single correctly-rounded IEEE op, so Spark,
NumPy, and the DuckDB oracle produce bit-identical scores.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

QUANT = 1000.0


def quantize(mat: np.ndarray) -> np.ndarray:
    """float -> int64 milli-units (exactly floor(double(x) * 1000))."""
    return np.floor(mat.astype(np.float64) * QUANT).astype(np.int64)


def cosine_e6(dots: np.ndarray, na: np.ndarray, nb: np.ndarray) -> np.ndarray:
    """floor(1e6 * dot / (sqrt(na)*sqrt(nb))) as int64; 0-norm -> min."""
    denom = np.sqrt(na.astype(np.float64)) * np.sqrt(nb.astype(np.float64))
    with np.errstate(divide="ignore", invalid="ignore"):
        c = np.floor(1000000.0 * dots.astype(np.float64) / denom)
    c = np.where(np.isfinite(c), c, np.float64(np.iinfo(np.int64).min))
    return c.astype(np.int64)


def _stack(series: pd.Series) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in series])


def topk_cosine(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """(qid, neighbor_id, cos_e6, rn) for the k nearest rows per query."""
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    qmat = quantize(_stack(pd.Series([q[1] for q in queries])))
    qnorm = (qmat * qmat).sum(axis=1)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            emat = quantize(_stack(pdf[vec_col]))
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            dots = emat @ qmat.T  # (n, m) exact int64
            enorm = (emat * emat).sum(axis=1)
            scores = cosine_e6(dots, enorm[:, None], qnorm[None, :])
            kk = min(k, len(pdf))
            out_q, out_id, out_s = [], [], []
            for j in range(qmat.shape[0]):
                col = scores[:, j].copy()
                cand_ids = ids
                if exclude_self:
                    mask = ids != qids[j]
                    col, cand_ids = col[mask], ids[mask]
                if not col.size:
                    continue
                kj = min(kk, col.size)
                # local top-k: partial select then exact order (desc score,
                # asc id) so ties are deterministic
                part = np.argpartition(-col, kj - 1)[:kj]
                order = np.lexsort((cand_ids[part], -col[part]))
                sel = part[order]
                out_q.extend([qids[j]] * kj)
                out_id.extend(cand_ids[sel].tolist())
                out_s.extend(col[sel].tolist())
            yield pd.DataFrame(
                {"qid": out_q, "neighbor_id": out_id, "cos_e6": out_s}
            )

    local = emb.select(
        F.col(id_col).cast("long").alias(id_col), vec_col
    ).mapInPandas(gen, schema="qid long, neighbor_id long, cos_e6 long")
    w = Window.partitionBy("qid").orderBy(
        F.col("cos_e6").desc(), F.col("neighbor_id")
    )
    return (
        local.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "neighbor_id", "cos_e6", "rn")
    )


def topk_oracle_sql(
    query_pred: str, k: int = 10, table: str = "embeddings"
) -> str:
    """DuckDB SQL computing the identical quantized-cosine top-k."""
    qv = "list_transform(embedding, x -> floor(x::double * 1000)::bigint)"
    return f"""
with q as (select vec_id as qid, {qv} as qv from {table} where {query_pred}),
e as (select vec_id, {qv} as ev from {table}),
scored as (
  select qid, vec_id as neighbor_id,
    floor(1000000.0 *
      list_sum(list_transform(list_zip(qv, ev), p -> p[1] * p[2]))::double /
      (sqrt(list_sum(list_transform(ev, x -> x*x))::double) *
       sqrt(list_sum(list_transform(qv, x -> x*x))::double)))::bigint as cos_e6
  from q cross join e where vec_id <> qid
),
ranked as (
  select qid, neighbor_id, cos_e6,
         row_number() over (partition by qid order by cos_e6 desc, neighbor_id) as rn
  from scored
)
select qid, neighbor_id, cos_e6, rn from ranked where rn <= {k}
"""
