"""Deterministic document chunking (training-data pipeline operator).

Splits long documents into fixed-size overlapping character windows —
the preprocessing step in front of tokenization/embedding at corpus
scale. Entirely JVM-side: chunk counts and offsets are codegen
expressions and the fan-out is a ``posexplode(sequence(...))`` generator
node, so a 100 TB corpus chunks as a map-only stage (no shuffle, no
Python, no UDF) and Catalyst pushes column pruning/filters through it.

Contract (window ``max_chars``, stride ``max_chars - overlap``):
- chunk i covers characters ``[i*stride, i*stride + max_chars)``;
- ``n_chunks = max(1, ceil((len - overlap) / stride))`` — consecutive
  chunks share exactly ``overlap`` characters and the last chunk always
  reaches the end of the document;
- null text is treated as empty and yields one empty chunk, so every
  input row survives (joins back to metadata never drop documents).

No reference counterpart (the reference is membership-only; mandated
training-pipeline operator). The DuckDB oracle replays the same integer
arithmetic via ``unnest(range(0, nc))``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    max_chars: int = 256,
    overlap: int = 64,
    chunk_idx_col: str = "chunk_idx",
    chunk_col: str = "chunk",
) -> DataFrame:
    """Explode each row into overlapping character-window chunks.

    Keeps every input column; adds ``chunk_idx`` (0-based) and ``chunk``.
    """
    if not 0 <= overlap < max_chars:
        raise ValueError(f"need 0 <= overlap < max_chars, got {overlap}/{max_chars}")
    stride = max_chars - overlap
    text = F.coalesce(F.col(text_col), F.lit(""))
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.length(text) - F.lit(overlap)) / F.lit(float(stride))),
    )
    idx = F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1))
    return (
        df.withColumn(chunk_idx_col, idx)
        .withColumn(
            chunk_col,
            F.substring(
                text, F.col(chunk_idx_col).cast("int") * stride + 1, max_chars
            ),
        )
    )


def chunk_sql(
    table: str,
    key_cols: str,
    text_col: str = "text",
    max_chars: int = 256,
    overlap: int = 64,
) -> str:
    """DuckDB oracle for :func:`chunk_documents` (same arithmetic)."""
    stride = max_chars - overlap
    return (
        f"with d as (select {key_cols}, coalesce({text_col}, '') as __t, "
        f"greatest(1, cast(ceil((length(coalesce({text_col}, '')) - {overlap})"
        f" / cast({stride} as double)) as bigint)) as __nc from {table}), "
        f"e as (select {key_cols}, __t, unnest(range(0, __nc)) as chunk_idx from d) "
        f"select {key_cols}, chunk_idx, "
        f"substring(__t, cast(chunk_idx * {stride} + 1 as int), {max_chars}) as chunk "
        f"from e"
    )
