"""Inverted index (postings) builder — the retrieval-side sink.

Term -> posting-list construction over the documents table: the
primitive under corpus search, contamination lookups, and
filter-by-term curation at scale.

Scale shape: a naive ``groupBy(term).collect_set(doc)`` dies on Zipf
skew — a stopword's posting list is O(corpus). Posting lists are
therefore SHARDED: the group key is ``(term, doc_id % n_shards)``, so
every per-group state is bounded by corpus/n_shards and the stopword
skew spreads over n_shards reducers. A reader unions shards of a term
(shards partition the doc space; list concatenation never needs a
re-sort across shards for id-range queries, and n_shards scales with
the corpus). Postings are distinct sorted doc_ids; per-doc term
frequencies ride along so TF-driven consumers avoid a second corpus
pass.

Everything is JVM-side (split/explode/sort_array/collect_list on
pre-aggregated rows); the per-term-shard aggregate is two-phase
(partial map-side (term, doc) counts first, so raw positions never
shuffle twice).

No reference counterpart (mandated training-pipeline adjacency);
value-exact DuckDB oracle (same grouping + ordered string_agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 4,
    min_df: int = 1,
) -> DataFrame:
    """(term, shard, df_docs, tf_total, postings) — sharded posting lists.

    ``postings`` is the sorted distinct doc_ids of the shard as
    ``"id:tf"`` CSV (deterministic, engine-portable). ``min_df`` filters
    on the term's GLOBAL document frequency (computed in the same pass
    via a term-level aggregate joined back — vocab-sized, not
    corpus-sized).
    """
    tokens = df.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
        ).alias("term"),
    ).filter(F.col("term") != "")
    # per-(term, doc) tf: map-side combinable, the only corpus-sized agg
    td = tokens.groupBy("term", "doc").agg(F.count(F.lit(1)).alias("tf"))
    shards = td.withColumn("shard", F.pmod(F.col("doc"), F.lit(n_shards)))
    per_shard = shards.groupBy("term", "shard").agg(
        F.count(F.lit(1)).alias("df_docs"),
        F.sum("tf").alias("tf_total"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc", "tf"))),
                lambda s: F.concat_ws(":", s["doc"], s["tf"]),
            ),
            ",",
        ).alias("postings"),
    )
    if min_df > 1:
        global_df = (
            per_shard.groupBy("term")
            .agg(F.sum("df_docs").alias("__gdf"))
            .filter(F.col("__gdf") >= min_df)
            .select("term")
        )
        per_shard = per_shard.join(global_df, "term")
    return per_shard


def postings_sql(
    corpus_cte: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 4,
    min_df: int = 1,
) -> str:
    """DuckDB oracle for :func:`build_postings` (same grouping/order)."""
    having = (
        f"where term in (select term from td group by term "
        f"having count(*) >= {min_df}) "
        if min_df > 1
        else ""
    )
    return (
        f"with corpus as ({corpus_cte}), "
        f"tok as (select {id_col} as doc, unnest(string_split({text_col}, ' ')) "
        f"as term from corpus), "
        f"td as (select term, doc, count(*) as tf from tok "
        f"where term != '' group by term, doc) "
        f"select term, doc % {n_shards} as shard, "
        f"count(*) as df_docs, sum(tf)::bigint as tf_total, "
        f"string_agg(doc || ':' || tf, ',' order by doc) as postings "
        f"from td {having}"
        f"group by term, doc % {n_shards}"
    )
