"""Document-level token co-occurrence counts (PMI numerators).

A training-data staple: which token pairs appear together in the same
document, and how often — the integer counts behind PMI / collocation /
embedding-context statistics. The reference library has no text operators
(its keys are opaque bytes, README.md:114); this is engine-side coverage
for the mandated text-analysis family.

Scale shape (the 100 TB plan):
- tokens are deduped *within* each document first (``array_distinct`` in
  codegen before the explode), so the join input is (doc, distinct-token)
  pairs — a map-side shrink with no shuffle of raw text;
- an optional ``top_v`` cap restricts the pair fan-out to the V most
  document-frequent tokens (deterministic tie-break on the token itself).
  The vocabulary ranking is one vocabulary-sized aggregate — tiny next to
  the corpus — and rejoins as a broadcast semi-join, so the quadratic
  per-doc pair blow-up is bounded by V, not by the raw vocabulary;
- the pair count itself is a self-equi-join on the doc id (co-partitioned
  hash join: one shuffle of the (doc, token) pairs) followed by a
  vocabulary-bounded groupBy — output is at most V·(V-1)/2 rows no matter
  the corpus size. All arithmetic is integer counts; PMI's logarithm is
  left to the consumer (cross-engine float logs differ in the last ulp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def doc_tokens(
    df: DataFrame, id_col: str, text_col: str, delim: str = " "
) -> DataFrame:
    """(doc, token) pairs, tokens deduplicated per document JVM-side."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(F.split(F.col(text_col), delim))).alias(
            "tok"
        ),
    ).filter(F.col("tok") != "")


def token_doc_frequencies(toks: DataFrame) -> DataFrame:
    """Per-token document frequency over the (doc, token) pair set."""
    return toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))


def token_cooccurrence(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_v: int | None = None,
    delim: str = " ",
) -> DataFrame:
    """Pair-level co-occurrence counts with per-token document frequencies.

    Returns ``(tok_a, tok_b, pair_docs, df_a, df_b)`` with ``tok_a < tok_b``
    — everything a consumer needs for PMI/Jaccard/Dice on token pairs.
    ``top_v`` bounds the vocabulary to the V most document-frequent tokens
    (ties broken by token text, so the cap is deterministic and
    engine-portable).
    """
    toks = doc_tokens(df, id_col, text_col, delim=delim)
    freq = token_doc_frequencies(toks)
    if top_v is not None:
        w = Window.orderBy(F.desc("df"), F.asc("tok"))
        freq = (
            freq.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= top_v)
            .drop("rk")
        )
        # vocabulary-sized dim: broadcast semi-join prunes the fact side
        toks = toks.join(F.broadcast(freq.select("tok")), "tok", "semi")
    a = toks.alias("a")
    b = toks.alias("b")
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("a.tok") < F.col("b.tok"))
        .groupBy(
            F.col("a.tok").alias("tok_a"), F.col("b.tok").alias("tok_b")
        )
        .agg(F.count(F.lit(1)).alias("pair_docs"))
    )
    fa = F.broadcast(freq.select(F.col("tok").alias("tok_a"), F.col("df").alias("df_a")))
    fb = F.broadcast(freq.select(F.col("tok").alias("tok_b"), F.col("df").alias("df_b")))
    return pairs.join(fa, "tok_a").join(fb, "tok_b").select(
        "tok_a", "tok_b", "pair_docs", "df_a", "df_b"
    )
