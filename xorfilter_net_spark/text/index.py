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


def substring_search(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    q_col: str = "q",
    gram_len: int = 6,
) -> DataFrame:
    """Exact substring search via character-gram candidate pruning.

    Finds every ``(query_id, doc_id)`` where the query string occurs as
    a SUBSTRING of the document text — the retrieval primitive behind
    "which documents already contain this span" lookups (contamination
    spot checks, quote attribution, licence-string scans).

    Scale shape (the reason this is not ``crossJoin + contains``): the
    document side explodes into its character ``gram_len``-grams in pure
    codegen (``explode(transform(sequence(...)))`` — map-only), then is
    immediately semi-joined against the BROADCAST set of query grams,
    so only gram hits survive to the one small aggregate; a candidate
    doc must contain ALL of a query's distinct grams (zero false
    negatives by construction — every substring occurrence implies
    every query gram occurs), and candidates are verified with an exact
    ``contains`` against the (tiny) rejoined text. Corpus never
    shuffles; the aggregate is bounded by gram-hit pairs, which the
    rarest query gram bounds. Queries must be >= ``gram_len`` chars
    (asserted) — shorter needles lack grams and would need a direct
    scan.
    """
    assert gram_len >= 2
    txt = F.coalesce(F.col(text_col), F.lit(""))

    def grams_of(col):
        n = F.greatest(F.length(col) - (gram_len - 1), F.lit(0))
        return F.transform(
            F.sequence(F.lit(1), n),
            lambda i: col.substr(i, F.lit(gram_len)),
        )

    # a needle shorter than gram_len has no grams and would silently
    # match nothing (a false negative) — fail loudly in-plan instead
    checked_q = F.when(
        F.length(F.col(q_col)) < gram_len,
        F.raise_error(
            F.concat(
                F.lit(
                    f"substring_search: query shorter than gram_len="
                    f"{gram_len}: "
                ),
                F.col(q_col),
            )
        ).cast("string"),
    ).otherwise(F.col(q_col))
    qg = queries.select(
        F.col(qid_col).alias("query_id"),
        F.explode(F.array_distinct(grams_of(checked_q))).alias("gram"),
    )
    n_qgrams = qg.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_qgrams")
    )
    dg = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(grams_of(txt))).alias("gram"),
    )
    from pyspark.sql.functions import broadcast

    hits = dg.join(broadcast(qg.select("query_id", "gram")), "gram")
    cand = (
        hits.groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .join(broadcast(n_qgrams), "query_id")
        .filter(F.col("n_hit") == F.col("n_qgrams"))
        .select("query_id", "doc_id")
    )
    # verify joins stream the CORPUS and broadcast the tiny candidate
    # set (pinned — stats at small SF would otherwise tempt Catalyst to
    # broadcast the docs table, the wrong side at scale)
    verified = (
        docs.select(F.col(id_col).alias("doc_id"), txt.alias("__t"))
        .join(broadcast(cand), "doc_id")
        .join(
            broadcast(queries.select(
                F.col(qid_col).alias("query_id"), F.col(q_col).alias("__q")
            )),
            "query_id",
        )
        .filter(F.contains(F.col("__t"), F.col("__q")))
        .select("query_id", "doc_id")
    )
    return verified


def substring_search_sql(
    corpus_cte: str,
    queries_cte: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle for :func:`substring_search`: the definitionally
    exact ``contains`` scan (small at oracle scale)."""
    return (
        f"with corpus as ({corpus_cte}), qs as ({queries_cte}) "
        f"select q.query_id, d.{id_col} as doc_id "
        f"from corpus d cross join qs q "
        f"where contains(coalesce(d.{text_col}, ''), q.q)"
    )
