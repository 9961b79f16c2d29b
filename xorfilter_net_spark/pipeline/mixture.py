"""Deterministic data-mixture interleave (training-data pipeline operator).

LM pretraining composes a corpus from weighted sources (domain/language
mixing a la Pile/ROOTS): the training order must visit source ``s`` with
frequency proportional to its weight, deterministically, at corpus scale.
This is stride scheduling: give each document its per-source rank ``r``
(content-keyed, so the schedule is a pure function of corpus content)
and the integer interleave key

    ``interleave_key = (r + 1) * (lcm(weights) / weight[source])``

Ordering by ``(interleave_key, source, id)`` interleaves sources in
weight proportion: every prefix of the schedule holds ~``w_s / sum(w)``
of its documents from source ``s``. All-integer arithmetic — no float
ratios, so the schedule is bit-identical across engines.

Scale design: the per-source rank is a global row-number *within each
source* — naively a single sorted partition per source (fatal when one
source is 90% of 100 TB). Same cure as text/packing.py: the md5 order
key's 2-hex-char prefix doubles as a shuffle bucket, per-(source,
bucket) counts (tiny: sources x 256 rows) produce exclusive bucket
offsets, and one manifest-row shuffle computes bucket-local row numbers
— ``r = bucket_offset + local_rank``. Bucket-major equals the global
order because the bucket prefixes the order key; no global sort, text
never shuffles, and per-window state is |source|/256.

The operator emits the *schedule manifest* (id, source, r,
interleave_key), not a reordered corpus: consumers sort lazily or feed
it to pack_sequences. Sources absent from ``weights`` are excluded —
mixture weights double as the corpus whitelist.

No reference counterpart (mandated training-pipeline operator).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..text.packing import BUCKET_HEX


def _strides(weights: dict[str, int]) -> dict[str, int]:
    if not weights:
        raise ValueError("weights must be non-empty")
    for s, w in weights.items():
        if not isinstance(w, int) or w <= 0:
            raise ValueError(f"weight for {s!r} must be a positive int, got {w!r}")
    m = math.lcm(*weights.values())
    return {s: m // w for s, w in weights.items()}


def mixture_interleave(
    df: DataFrame,
    source_col: str,
    weights: dict[str, int],
    id_col: str = "doc_id",
) -> DataFrame:
    """Schedule manifest: (id, source, per-source rank ``r``, integer
    ``interleave_key``). Deterministic across runs, partitionings, and
    engines; rows whose source is not in ``weights`` are dropped."""
    strides = _strides(weights)
    d = (
        df.select(
            F.col(id_col),
            F.col(source_col).alias("source"),
            F.md5(F.col(id_col).cast("string")).alias("__ord"),
        )
        .filter(F.col("source").isin(list(weights)))
        .withColumn("__bucket", F.substring("__ord", 1, BUCKET_HEX))
    )

    # Pass A: per-(source, bucket) counts -> exclusive offsets (tiny)
    counts = d.groupBy("source", "__bucket").agg(F.count("*").alias("__n"))
    bw = (
        Window.partitionBy("source")
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "source",
        "__bucket",
        F.coalesce(F.sum("__n").over(bw), F.lit(0)).alias("__boff"),
    )

    # Pass B: bucket-local row numbers + offset = global per-source rank
    lw = Window.partitionBy("source", "__bucket").orderBy("__ord", id_col)
    stride_map = F.create_map(
        *[F.lit(x) for kv in strides.items() for x in kv]
    )
    return (
        d.join(F.broadcast(offsets), ["source", "__bucket"])
        .withColumn("r", F.col("__boff") + F.row_number().over(lw) - 1)
        .withColumn(
            "interleave_key",
            ((F.col("r") + 1) * F.element_at(stride_map, F.col("source"))).cast(
                "bigint"
            ),
        )
        .select(id_col, "source", "r", "interleave_key")
    )


def mixture_sql(
    table: str,
    source_col: str,
    weights: dict[str, int],
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for :func:`mixture_interleave`: one global
    row_number per source (equal to the bucketed plan because the bucket
    prefixes the order key)."""
    strides = _strides(weights)
    in_list = ", ".join(f"'{s}'" for s in weights)
    case = (
        "case source "
        + " ".join(f"when '{s}' then {k}" for s, k in strides.items())
        + " end"
    )
    return (
        f"with d as (select {id_col}, {source_col} as source, "
        f"md5(cast({id_col} as varchar)) as __ord from {table} "
        f"where {source_col} in ({in_list})), "
        f"r as (select {id_col}, source, cast(row_number() over "
        f"(partition by source order by __ord, {id_col}) - 1 as bigint) as r from d) "
        f"select {id_col}, source, r, cast((r + 1) * {case} as bigint) as interleave_key "
        f"from r"
    )
