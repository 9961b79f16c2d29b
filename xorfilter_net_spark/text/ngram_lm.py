"""Corpus n-gram LM signals — CCNet-style fluency/quality scoring.

CCNet (Wenzek et al., LREC 2020) ranks web text by language-model
perplexity; the distributed, model-free analog scores each document
against the corpus's OWN n-gram statistics:

- **coverage**: fraction of the doc's bigrams seen >= min_count times
  corpus-wide — low coverage flags boilerplate-free gibberish the same
  way high LM perplexity does;
- **rare-token rate**: unigrams below min_count (OOV-ish);
- **add-1 smoothed bigram NLL** (`add_one_nll`): the actual
  perplexity-proxy number, float — kept OUT of the driver oracle (ln()
  ulp is not an engine-portable contract; the repo-wide convention is
  integer/micro-int signals in oracles, logs consumer-side) and pinned
  instead by a NumPy differential test.

Spark shape (two corpus passes, both single-shuffle):
1. count tables: adjacent bigrams via a codegen ``transform(sequence)``
   -> explode -> groupBy — the same stream feeds unigram counts;
   vocab-sized outputs (Heaps' law), candidates for broadcast.
2. scoring: the doc bigram stream joins the count table on the bigram
   (AQE picks broadcast when the vocab fits) and re-aggregates per doc —
   integer counters only.

Self-counting is intentional: a doc's own occurrence contributes to the
corpus statistics (every doc has coverage > 0 when min_count=1), is
order-independent and exactly reproducible by the oracle.

No reference counterpart (mandated training-pipeline operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bigram_counts", "lm_coverage_signals", "add_one_nll"]


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair, map-only."""
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    # sequence(1, 0) counts DOWN in Spark; build over a floor of 1 and
    # slice to the true pair count (0 for single-token docs).
    # try_element_at: the floor row probes index size+1 on 1-token docs
    # (NULL, sliced away) — plain element_at throws under ANSI.
    pairs = F.expr(
        "slice(transform(sequence(1, greatest(size(__t) - 1, 1)), "
        "i -> struct(try_element_at(__t, i) as w1, "
        "try_element_at(__t, i + 1) as w2)), "
        "1, greatest(size(__t) - 1, 0))"
    )
    return (
        df.select(F.col(id_col), toks.alias("__t"))
        .select(id_col, F.explode(pairs).alias("p"))
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def bigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(w1, w2, c) corpus bigram counts — the 'training' pass."""
    return (
        _doc_bigrams(df.select(F.lit(0).alias("__id"), text_col), "__id", text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def unigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, c) corpus unigram counts."""
    return (
        df.select(
            F.explode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def lm_coverage_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Per-doc integer fluency signals vs the corpus's own statistics.

    (id, n_tokens, n_rare_tokens, n_bigrams, n_covered_bigrams,
    coverage_e6). ``coverage_e6 = floor(1e6 * covered / bigrams)``
    (0 when the doc has no bigram). Exact integer/micro-int arithmetic,
    engine-portable.
    """
    bg = _doc_bigrams(df, id_col, text_col)
    bc = bigram_counts(df, text_col).filter(F.col("c") >= min_count)
    covered = (
        bg.join(bc.select("w1", "w2", F.lit(1).alias("__hit")), ["w1", "w2"], "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_covered_bigrams"),
        )
    )
    uc = unigram_counts(df, text_col).filter(F.col("c") < min_count)
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), " ")).alias(
            "w"
        ),
    )
    rare = (
        toks.join(uc.select("w", F.lit(1).alias("__rare")), "w", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce("__rare", F.lit(0))).alias("n_rare_tokens"),
        )
    )
    return (
        df.select(id_col)
        .join(rare, id_col, "left")
        .join(covered, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_rare_tokens", F.lit(0)).alias("n_rare_tokens"),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("n_covered_bigrams", F.lit(0)).alias(
                "n_covered_bigrams"
            ),
            F.when(F.coalesce("n_bigrams", F.lit(0)) == 0, F.lit(0))
            .otherwise(
                F.floor(
                    1000000.0
                    * F.col("n_covered_bigrams")
                    / F.col("n_bigrams")
                )
            )
            .cast("long")
            .alias("coverage_e6"),
        )
    )


def add_one_nll(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, nll) — mean add-1-smoothed bigram negative log-likelihood,
    ``-mean(ln((c(w1,w2)+1) / (c(w1)+V)))`` — the perplexity proxy.

    Float output; validated by a NumPy differential test, not the SQL
    oracle (ln ulp is not an engine contract).
    """
    bg = _doc_bigrams(df, id_col, text_col)
    bc = bigram_counts(df, text_col)
    uc = unigram_counts(df, text_col)
    v = uc.count()
    scored = (
        bg.join(bc, ["w1", "w2"], "left")
        .join(uc.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1", "left")
        .select(
            id_col,
            (
                -F.log(
                    (F.coalesce("c", F.lit(0)) + 1.0)
                    / (F.coalesce("c1", F.lit(0)) + float(v))
                )
            ).alias("__nll"),
        )
    )
    return scored.groupBy(id_col).agg(F.avg("__nll").alias("nll"))


def lm_signals_sql(
    corpus_cte: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> str:
    """DuckDB oracle for :func:`lm_coverage_signals`."""
    return (
        f"with corpus as ({corpus_cte}), "
        f"tk as (select {id_col}, string_split({text_col}, ' ') as t from corpus), "
        f"bg as (select {id_col}, t[i] as w1, t[i+1] as w2 "
        f"from tk, unnest(range(1, greatest(len(t), 1))) as u(i)), "
        f"bc as (select w1, w2 from bg group by w1, w2 "
        f"having count(*) >= {min_count}), "
        f"cov as (select b.{id_col}, count(*) as n_bigrams, "
        f"sum(case when c.w1 is not null then 1 else 0 end)::bigint "
        f"as n_covered_bigrams "
        f"from bg b left join bc c on b.w1 = c.w1 and b.w2 = c.w2 "
        f"group by b.{id_col}), "
        f"tok as (select {id_col}, unnest(string_split({text_col}, ' ')) "
        f"as w from corpus), "
        f"uc as (select w from tok group by w "
        f"having count(*) < {min_count}), "
        f"rare as (select t.{id_col}, count(*) as n_tokens, "
        f"sum(case when u.w is not null then 1 else 0 end)::bigint as n_rare_tokens "
        f"from tok t left join uc u on t.w = u.w group by t.{id_col}) "
        f"select c.{id_col}, "
        f"coalesce(r.n_tokens, 0) as n_tokens, "
        f"coalesce(r.n_rare_tokens, 0) as n_rare_tokens, "
        f"coalesce(v.n_bigrams, 0) as n_bigrams, "
        f"coalesce(v.n_covered_bigrams, 0) as n_covered_bigrams, "
        f"case when coalesce(v.n_bigrams, 0) = 0 then 0 else "
        f"floor(1000000.0 * v.n_covered_bigrams / v.n_bigrams)::bigint end "
        f"as coverage_e6 "
        f"from corpus c left join rare r using ({id_col}) "
        f"left join cov v using ({id_col})"
    )
