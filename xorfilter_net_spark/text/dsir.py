"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023), the standard pretraining-corpus selection operator:
score every raw document by the log likelihood ratio of a *target*
distribution (a small high-quality/eval-like sample) vs the *raw*
distribution, both estimated over hashed n-gram bag features, then keep
the top-k raw documents.

Distributed shape (everything corpus-sized is map-only or one
map-side-combined aggregate):

1. **Feature stream** (map-only codegen): each doc explodes into its
   whitespace unigrams + adjacent bigrams; each gram hashes into one of
   ``16**n_hex`` buckets via ``substr(md5(gram), 1, n_hex)`` — the md5
   prefix is the repo's engine-portable hash (identical in Spark, DuckDB
   and hashlib, so oracles and differentials replay it bit-for-bit).
2. **Distribution estimation**: ONE hash aggregate per distribution;
   output is bucket-bounded (<= 4096 rows at n_hex=3) regardless of
   corpus size — the two count tables cross to the driver as a few KB.
3. **Log-ratio table**: driver-side NumPy computes the add-1-smoothed
   per-bucket log ratio ``lam = ln((ct+1)/(Nt+B)) - ln((cr+1)/(Nr+B))``
   and quantizes to **int64 micro-units** (``lam_e6``). Integer scores
   make the per-doc sum exact, associative, and bit-identical under any
   partitioning/merge order — the repo-wide convention that keeps float
   ulp out of contracts (ngram_lm.py does the same for its NLL).
4. **Scoring** (one shuffle): the raw gram stream broadcast-joins the
   B-row ratio table and sums per doc — partial aggregation means only
   (doc_id, partial_sum) rows shuffle, never grams or text.
5. **Selection**: global top-k by the length-normalized score
   ``avg_e6 = score_e6 div n_grams`` (integer division — still exact
   and partitioning-independent) with ``(desc, id)`` tie-break — a
   TakeOrdered, no full sort. Normalizing by gram count removes the
   doc-length bias of the raw sum (a long mediocre doc accumulates more
   |log-ratio| than a short on-target one; measured on the sf0.01 gate:
   recall 0.42 raw-sum vs 0.94+ normalized).

The paper draws k samples with Gumbel noise; we select the top-k
deterministically (documented deviation — reproducibility is a repo
contract; the ranking is the paper's, only the sampling jitter is
dropped).

No reference counterpart (mandated training-pipeline operator).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "gram_buckets",
    "bucket_counts",
    "dsir_scores",
    "dsir_select",
    "gram_bucket_sql",
]

N_HEX_DEFAULT = 3  # 4096 buckets; the paper uses 10k — same order


def gram_buckets(
    df: DataFrame, id_col: str, text_col: str, n_hex: int = N_HEX_DEFAULT
) -> DataFrame:
    """(id, bucket) — one row per unigram and adjacent bigram, map-only.

    Unigrams and bigrams come out of ONE codegen expression (token array
    ++ sliced bigram array) so the stream is a single explode; sequence
    floors/slices handle 1-token docs exactly like ngram_lm._doc_bigrams.
    """
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    grams = F.expr(
        "concat(__t, slice(transform(sequence(1, greatest(size(__t) - 1, 1)), "
        "i -> concat_ws(' ', try_element_at(__t, i), try_element_at(__t, i + 1))), "
        "1, greatest(size(__t) - 1, 0)))"
    )
    return (
        df.select(F.col(id_col), toks.alias("__t"))
        .select(id_col, F.explode(grams).alias("g"))
        .select(
            id_col, F.substring(F.md5("g"), 1, n_hex).alias("bucket")
        )
    )


def bucket_counts(
    df: DataFrame, text_col: str, n_hex: int = N_HEX_DEFAULT
) -> DataFrame:
    """(bucket, c) hashed-gram counts — output bounded by 16**n_hex rows."""
    return (
        gram_buckets(
            df.select(F.lit(0).alias("__id"), text_col), "__id", text_col, n_hex
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _log_ratio_table(
    spark: SparkSession,
    target_counts: list[tuple[str, int]],
    raw_counts: list[tuple[str, int]],
    n_hex: int,
) -> DataFrame:
    """Driver-side add-1-smoothed per-bucket log ratio, int64 micro-units."""
    b_total = 16**n_hex
    tc = dict(target_counts)
    rc = dict(raw_counts)
    n_t = sum(tc.values())
    n_r = sum(rc.values())
    rows = []
    for b in sorted(set(tc) | set(rc)):
        lam = math.log((tc.get(b, 0) + 1) / (n_t + b_total)) - math.log(
            (rc.get(b, 0) + 1) / (n_r + b_total)
        )
        rows.append((b, int(round(lam * 1_000_000))))
    return spark.createDataFrame(rows, "bucket string, lam_e6 long")


def dsir_scores(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_hex: int = N_HEX_DEFAULT,
) -> DataFrame:
    """(id, n_grams, score_e6, avg_e6): per-raw-doc importance score.

    score_e6 = sum over the doc's grams of the micro-quantized bucket
    log ratio — an exact integer, reproducible under any partitioning;
    avg_e6 = score_e6 div n_grams, the length-normalized ranking key.
    """
    spark = raw.sparkSession
    t_counts = [
        (r["bucket"], r["c"])
        for r in bucket_counts(target, text_col, n_hex).collect()
    ]
    r_counts = [
        (r["bucket"], r["c"])
        for r in bucket_counts(raw, text_col, n_hex).collect()
    ]
    lam = _log_ratio_table(spark, t_counts, r_counts, n_hex)
    # every raw gram's bucket is present in r_counts (counted from the
    # same pool), so the inner broadcast join drops nothing
    return (
        gram_buckets(raw, id_col, text_col, n_hex)
        .join(F.broadcast(lam), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("lam_e6").alias("score_e6"),
        )
        .withColumn("avg_e6", F.expr("score_e6 div n_grams"))
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    n_hex: int = N_HEX_DEFAULT,
) -> DataFrame:
    """Top-k raw docs by length-normalized importance score
    (deterministic ties on id)."""
    scores = dsir_scores(raw, target, id_col, text_col, n_hex)
    return scores.orderBy(
        F.col("avg_e6").desc(), F.col(id_col)
    ).limit(k)


def gram_bucket_sql(pool_sql: str, n_hex: int = N_HEX_DEFAULT) -> str:
    """DuckDB CTE fragment: (dist, bucket) gram-bucket stream over
    ``pool_sql`` (must yield columns dist, text) — the oracle replay of
    ``gram_buckets``. DuckDB lists are 1-based like the Spark sequence."""
    return f"""
    __toks as (select dist, string_split(coalesce(text, ''), ' ') as t
               from ({pool_sql})),
    __uni as (select dist, unnest(t) as g from __toks),
    __bi_idx as (select dist, t, unnest(range(1, len(t))) as i from __toks),
    __bi as (select dist, t[i] || ' ' || t[i + 1] as g from __bi_idx),
    __grams as (select dist, substr(md5(g), 1, {n_hex}) as bucket
                from (select * from __uni union all select * from __bi))
    """
