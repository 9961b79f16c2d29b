"""Per-document top-k salient terms by TF-IDF (training-data pipeline op).

The standard corpus-statistics primitive behind keyword extraction,
near-duplicate triage and quality heuristics: score each (document, term)
by term frequency weighted by inverse document frequency and keep each
document's k highest-scoring terms. The reference library has no text
operators (its keys are opaque bytes, /root/reference/README.md:114);
this is engine-side coverage for the mandated text-analysis family.

Scale shape (the 100 TB plan):
- raw text never shuffles: tokenization is a codegen ``explode(split())``
  directly over the scan, immediately collapsed by the (doc, term) partial
  aggregate — the first exchange carries (doc_id, tok, count) triples;
- document frequency is a second, vocabulary-sized aggregate *over the tf
  table*, not the corpus (the tf table already holds one row per distinct
  (doc, term));
- the tf x df join is a plain hash equi-join on the term — both sides are
  aggregates, orders of magnitude smaller than the corpus;
- the per-document top-k runs as row_number over (doc, score desc) and
  Spark plans a Partial ``WindowGroupLimit`` before the exchange, so at
  most k rows per (doc, map task) shuffle for the final rank.

Cross-engine exactness: the score is the raw ratio ``tf / df`` — both
operands are exactly-representable integers and IEEE-754 division is
correctly rounded, so Spark and any ANSI engine produce bit-identical
doubles and therefore identical rankings (deterministic tie-break on the
term itself). The classical ``log(N/df)`` damping is left to the consumer,
exactly like the PMI log in text/cooccur.py: a cross-engine ``ln`` can
differ in the last ulp and silently flip near-tied ranks. Monotonicity
note: within one document ``tf/df`` and ``tf * log(N/df)`` agree on the
ranking whenever df differs (log damping only reweights, the ratio
dominates ties the same way); the exposed tf and df columns let a consumer
apply any damping downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def term_frequencies(
    df: DataFrame, id_col: str, text_col: str, delim: str = " "
) -> DataFrame:
    """(doc_id, tok, tf) triples — the corpus-sized pass, one aggregate."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), delim)).alias("tok"),
    ).filter(F.col("tok") != "")
    return toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))


def tfidf_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    delim: str = " ",
) -> DataFrame:
    """Each document's top-k terms by tf/df with a deterministic tie-break.

    Returns ``(doc_id, tok, tf, df, rnk)`` with ``rnk`` in 1..k — integer
    evidence columns only, so the result is exactly comparable across
    engines (the double score is an internal ordering key).
    """
    tf = term_frequencies(df, id_col, text_col, delim)
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "tok")
    w = Window.partitionBy("doc_id").orderBy(
        (F.col("tf").cast("double") / F.col("df")).desc(), F.col("tok").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "tok", "tf", "df", "rnk")
    )
