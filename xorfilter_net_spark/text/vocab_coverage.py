"""Vocabulary coverage / OOV-rate report (training-data pipeline op).

Before training a tokenizer or fixing a vocab size, the standard
corpus question is COVERAGE: if the vocabulary keeps the top-V tokens
by corpus frequency, what fraction of each document's tokens falls
outside it? High per-doc OOV rate flags foreign-language slices,
boilerplate-stripped fragments, and encoding damage; the corpus-level
histogram drives the V-vs-coverage tradeoff (the same curve BPE/
WordPiece training reads, computed here without training anything).

Scale shape (the 100 TB plan):
- tokenization is codegen ``explode(split())`` over the scan — raw
  text never shuffles; the first exchange carries (token, count)
  pairs after a map-side partial aggregate, so its width is the
  VOCABULARY, not the corpus;
- the top-V cut is a window over the vocabulary-sized frequency
  table (rank by count desc, token asc — deterministic tiebreak);
- per-doc OOV counting re-streams the token stream map-only and
  joins it against the BROADCAST top-V set (V rows), then one
  doc_id-keyed aggregate — the only corpus-sized exchange, carrying
  (doc_id, flag) pairs;
- rates are integer micro-units (floor(1e6 * oov / n)), the repo's
  cross-engine convention — no float drift between engines.

No reference counterpart; mandated text-analysis adjacency.
Value-exact DuckDB oracle (vocab_coverage_oracle_sql) replays the
identical program.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def vocab_coverage(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 256,
    delim: str = " ",
) -> DataFrame:
    """(doc_id, n_tokens, n_oov, oov_e6) per document, where the
    vocabulary is the corpus's top ``vocab_size`` tokens by frequency
    (ties broken by token asc). Documents with zero tokens report
    (0, 0, 0)."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    # \Q...\E quotes the delimiter so it splits as a LITERAL — the
    # DuckDB oracle's string_split is literal, and an unquoted regex
    # delimiter ('|', '.') would silently split a different program
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(F.col(text_col), "\\Q" + delim + "\\E")
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("tok"))
    vocab = (
        freq.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= vocab_size)
        .select("tok")
    )
    flagged = toks.join(
        F.broadcast(vocab.withColumn("__in", F.lit(1))), "tok", "left"
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum((F.col("__in").isNull()).cast("long"))
        .cast("long")
        .alias("n_oov"),
    )
    # zero-token documents (empty / whitespace-only text) still get a row
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .distinct()
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
            F.when(F.coalesce("n_tokens", F.lit(0)) == 0, F.lit(0))
            .otherwise(
                F.floor(1000000 * F.col("n_oov") / F.col("n_tokens"))
            )
            .cast("long")
            .alias("oov_e6"),
        )
    )


def vocab_coverage_oracle_sql(
    src: str = "documents",
    id_col: str = "doc_id",
    vocab_size: int = 256,
    delim: str = " ",
) -> str:
    """DuckDB replay of the identical top-V + OOV-count program (the
    split is LITERAL on both engines — the Spark side \\Q-quotes the
    delimiter).

    NOTE the window's ORDER BY is the window-wide vocabulary rank, not
    per-partition: same single deterministic (count desc, token asc)
    rank as the Spark side."""
    d = delim.replace("'", "''")
    return f"""
    with toks as (
        select {id_col} as doc_id, tok
        from (select {id_col}, unnest(string_split(text, '{d}')) as tok
              from {src})
        where tok <> ''),
    freq as (select tok, count(*) as n from toks group by tok),
    vocab as (
        select tok from (
            select tok, row_number() over (order by n desc, tok) as rnk
            from freq)
        where rnk <= {vocab_size}),
    per_doc as (
        select doc_id,
               cast(count(*) as bigint) as n_tokens,
               cast(sum(case when v.tok is null then 1 else 0 end)
                    as bigint) as n_oov
        from toks t left join vocab v using (tok)
        group by doc_id)
    select d.doc_id,
           coalesce(p.n_tokens, 0) as n_tokens,
           coalesce(p.n_oov, 0) as n_oov,
           cast(case when coalesce(p.n_tokens, 0) = 0 then 0
                else floor(1000000.0 * p.n_oov / p.n_tokens) end
                as bigint) as oov_e6
    from (select distinct {id_col} as doc_id from {src}) d
    left join per_doc p using (doc_id)
    """
