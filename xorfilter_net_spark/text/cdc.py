"""Content-defined chunking (CDC) — split documents at rolling-content
boundaries instead of fixed offsets (the LBFS/FastCDC idea that powers
binary/file-level dedup in backup systems and artifact stores, applied
to text): a position starts a new chunk iff the hash of the k-gram at
that position falls under a threshold. Boundaries are a pure function of
LOCAL content, so an insertion near the front of a document shifts only
the chunks that contain the edit — every later chunk re-aligns and
hashes identically (the shift-invariance fixed-size chunking lacks, and
the reason cross-document chunk dedup works at all).

Spark shape: one ``posexplode(sequence)`` gram stream in codegen, the
boundary predicate as the repo's engine-portable md5-hex-prefix compare
(relational/sampling.py idiom — the DuckDB oracle runs the identical
expression), one per-doc window (``lead`` over boundary rows — state
bounded by boundaries per doc, never corpus-sized) to close chunks, and
codegen ``substr``/``md5`` for chunk extraction + content hash. Zero
Python anywhere.

Boundary probability = (threshold/16^digits); expected chunk length is
its reciprocal with a geometric tail — classic CDC has no hard min/max
either without sequential post-passes; compose with ``chunk_documents``
(fixed windows) when hard bounds matter more than shift-invariance.

Cross-document duplicated-chunk statistics (``chunk_dedup_stats``) are
one groupBy on the chunk hash — the storage-dedup ratio estimate.

No reference counterpart (beyond-reference dedup/text family; the
byte-level sibling of the ExactSubstr span operator in dedup/spans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["content_defined_chunks", "chunk_dedup_stats"]


def content_defined_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    boundary_hex: str = "04",
) -> DataFrame:
    """(id, chunk_idx, start, length, chunk_hash) — 1-based character
    offsets; boundary at position i (i > 1) iff
    ``substr(md5(substr(text, i, k)), 1, len(boundary_hex)) <
    boundary_hex``; position 1 always starts a chunk. Docs shorter than
    1 char emit nothing; the k-gram at a boundary may run past doc end
    near the tail (substr truncates — still deterministic).

    Expected chunk length = 16^len(boundary_hex) / int(boundary_hex, 16)
    characters (64 for the default '04' at 2 digits).
    """
    if not boundary_hex or int(boundary_hex, 16) == 0:
        raise ValueError("boundary_hex must be a nonzero hex string")
    d = len(boundary_hex)
    txt = F.coalesce(F.col(text_col), F.lit(""))
    base = df.select(
        F.col(id_col).alias("id"), txt.alias("__t"), F.length(txt).alias("__n")
    ).filter(F.col("__n") > 0)
    pos = base.select(
        "id",
        "__t",
        "__n",
        F.explode(F.sequence(F.lit(1), F.col("__n"))).alias("i"),
    )
    is_start = (F.col("i") == 1) | (
        F.substring(
            F.md5(F.expr(f"substring(__t, i, {k})")), 1, d
        )
        < F.lit(boundary_hex)
    )
    starts = pos.filter(is_start).select("id", "__t", "__n", "i")
    w = Window.partitionBy("id").orderBy("i")
    return (
        starts.withColumn(
            "__end", F.coalesce(F.lead("i").over(w), F.col("__n") + 1)
        )
        .withColumn("chunk_idx", F.row_number().over(w) - 1)
        .select(
            "id",
            "chunk_idx",
            F.col("i").alias("start"),
            (F.col("__end") - F.col("i")).alias("length"),
            F.md5(
                F.expr("substring(__t, i, __end - i)")
            ).alias("chunk_hash"),
        )
    )


def chunk_dedup_stats(chunks: DataFrame) -> DataFrame:
    """(n_chunks, n_distinct_chunks, n_dup_chunks, dup_chars) — the
    storage-dedup ratio numerators, one aggregate over the chunk table."""
    per = chunks.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.max("length").alias("length"),
    )
    return per.agg(
        F.sum("cnt").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_chunks"),
        (F.sum("cnt") - F.count(F.lit(1))).cast("long").alias("n_dup_chunks"),
        F.sum((F.col("cnt") - 1) * F.col("length"))
        .cast("long")
        .alias("dup_chars"),
    )
