"""Sequence-packing manifest for LM pretraining (training-data pipeline
operator).

Pretraining consumes documents as one concatenated token stream chopped
into fixed-length training sequences ("concatenate and chunk" — the GPT
packing scheme). The planning artifact is a *packing manifest*: for every
document, its global token offset in the stream and the range of training
sequences it lands in. Producing that manifest needs a **global prefix
sum over a deterministic total order of the corpus** — the interesting
part at 100 TB, because a naive global ``Window.orderBy`` funnels every
row through one sorted range and a naive global sort shuffles the corpus.

Scale design (classic two-pass distributed prefix sum):

1. The total order is content-keyed and engine-portable:
   ``ord = md5(cast(id as string))``, ties broken by id. The *bucket* is
   the first two hex chars of ``ord`` (256 buckets) — a prefix of the
   sort key, so bucket-major order IS the global order and no global
   sort ever happens.
2. Pass A (tiny): per-bucket token subtotals -> exclusive running totals
   over the ≤256-row bucket table (driver-scale window) -> broadcast
   join back as each bucket's global starting offset.
3. Pass B (one shuffle of (id, n_tokens) pairs — the text column never
   shuffles): per-bucket window cumsum + bucket offset = global offset.
   Per-bucket state is ~|corpus|/256 manifest rows, and the bucket count
   is a knob; skewed buckets cannot exist (md5 is uniform).

Everything is whole-stage codegen (token counting is the same
``regexp_extract_all`` expression as text/analysis.py); no Python, no
UDFs. The DuckDB oracle replays the identical arithmetic with a single
global window — equal by the prefix-consistency argument above.

No reference counterpart (the reference is membership-only; mandated
training-pipeline operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .analysis import TOKEN_RE, _re_lit

#: number of hex characters of the md5 order key used as the bucket
#: prefix (2 -> 256 buckets). A prefix of the sort key, so bucket-major
#: traversal preserves the global order.
BUCKET_HEX = 2


def _ntok_expr(dialect: str, text_col: str) -> str:
    """Engine-portable token count (same tokenizer as text/analysis.py)."""
    arr = f"regexp_extract_all(coalesce({text_col}, ''), {_re_lit(dialect, TOKEN_RE)}, 0)"
    n = f"size({arr})" if dialect == "spark" else f"len({arr})"
    return f"cast({n} as bigint)"


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 2048,
) -> DataFrame:
    """Packing manifest: one row per document with

    - ``n_tokens``   — tokens this document contributes to the stream;
    - ``start_offset`` — the document's global token offset (exclusive
      prefix sum over the content-keyed corpus order);
    - ``first_seq`` / ``last_seq`` — the training-sequence indexes
      (stream chunked into ``seq_len``-token sequences) the document's
      tokens span; NULL for empty documents;
    - ``n_seqs``     — how many sequences the document touches (0 for
      empty documents).

    Deterministic across runs, partitionings, and engines; empty/null
    documents survive with ``n_tokens = 0`` so manifest joins never drop
    rows.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    d = df.select(
        F.col(id_col),
        F.md5(F.col(id_col).cast("string")).alias("__ord"),
        F.expr(_ntok_expr("spark", text_col)).alias("n_tokens"),
    ).withColumn("__bucket", F.substring("__ord", 1, BUCKET_HEX))

    # Pass A: per-bucket subtotals -> exclusive bucket offsets (≤256 rows)
    totals = d.groupBy("__bucket").agg(F.sum("n_tokens").alias("__btok"))
    bw = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__bucket",
        F.coalesce(F.sum("__btok").over(bw), F.lit(0)).alias("__boff"),
    )

    # Pass B: per-bucket cumsum (one shuffle of manifest-sized rows)
    w = (
        Window.partitionBy("__bucket")
        .orderBy("__ord", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = (
        d.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            "start_offset",
            F.col("__boff") + F.coalesce(F.sum("n_tokens").over(w), F.lit(0)),
        )
        .withColumn(
            "first_seq",
            F.when(F.col("n_tokens") > 0, F.expr(f"start_offset div {seq_len}")),
        )
        .withColumn(
            "last_seq",
            F.when(
                F.col("n_tokens") > 0,
                F.expr(f"(start_offset + n_tokens - 1) div {seq_len}"),
            ),
        )
        .withColumn(
            "n_seqs",
            F.coalesce(
                F.col("last_seq") - F.col("first_seq") + F.lit(1), F.lit(0)
            ).cast("bigint"),
        )
    )
    return packed.select(
        id_col, "n_tokens", "start_offset", "first_seq", "last_seq", "n_seqs"
    )


def pack_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 2048,
) -> str:
    """DuckDB oracle for :func:`pack_sequences`: the same arithmetic as
    one global window (equal to the bucketed plan because the bucket is
    a prefix of the order key)."""
    ntok = _ntok_expr("duckdb", text_col)
    return (
        f"with d as (select {id_col}, md5(cast({id_col} as varchar)) as __ord, "
        f"{ntok} as n_tokens from {table}), "
        f"c as (select {id_col}, n_tokens, cast(coalesce(sum(n_tokens) over "
        f"(order by __ord, {id_col} rows between unbounded preceding and 1 preceding), 0) "
        f"as bigint) as start_offset from d) "
        f"select {id_col}, n_tokens, start_offset, "
        f"case when n_tokens > 0 then start_offset // {seq_len} end as first_seq, "
        f"case when n_tokens > 0 then (start_offset + n_tokens - 1) // {seq_len} end as last_seq, "
        f"cast(coalesce((start_offset + n_tokens - 1) // {seq_len} - start_offset // {seq_len} + 1, 0) "
        f"as bigint) as n_seqs "
        f"from c"
    )
