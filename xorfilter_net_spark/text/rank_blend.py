"""Borda rank aggregation of quality signals (training-data op).

Curation pipelines score documents with several heterogeneous quality
signals (length, lexical diversity, classifier scores, LM fluency) and
must combine them into ONE selection order. Averaging raw scores is
scale-sensitive and breaks when a signal is re-calibrated; the robust
standard is RANK aggregation: rank per signal, then Borda-sum the
ranks. A document must be good under *several* lenses to rank high —
single-metric gaming (one long spammy doc) stops working.

Signals here are integer-exact corpus statistics (char count, word
count, distinct-word count), so every rank and the Borda sum replay
bit-identically in any engine; real deployments swap in classifier/LM
scores without changing the shape.

Scale shape: signals are map-only codegen; each rank is a window
PARTITIONED BY the group column (language here), so the sorts are
partition-bounded, never a global order — the one exchange keys the
group, and all three ranks plus the final consensus rank share it
(Catalyst reuses the partitioning; the ranks differ only in sort
order, which is a partition-local re-sort, not a new shuffle). At
10^12 docs a lang-bucketed table removes the exchange entirely.

No reference counterpart; mandated text-curation adjacency.
Value-exact DuckDB oracle (rank_blend_oracle_sql) replays the
identical window program.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_blend(
    docs: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    top: int = 5,
) -> DataFrame:
    """Per-group Borda consensus of three integer quality signals:
    (group, doc_id, n_chars, n_words, n_distinct, borda, consensus)
    for each group's ``top`` best documents. Ranks are dense in
    (signal desc, doc_id asc) order — the id tiebreak makes every rank
    a pure function of the data."""
    if top < 1:
        raise ValueError(f"top must be >= 1, got {top}")
    words = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda t: t != "",
    )
    sig = docs.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("doc_id"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).cast("long").alias(
            "n_chars"
        ),
        F.size(words).cast("long").alias("n_words"),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct"),
    )
    def rnk(c: str):
        return F.row_number().over(
            Window.partitionBy("grp").orderBy(
                F.col(c).desc(), F.col("doc_id").asc_nulls_first()
            )
        )

    ranked = sig.select(
        "*",
        rnk("n_chars").alias("r1"),
        rnk("n_words").alias("r2"),
        rnk("n_distinct").alias("r3"),
    ).withColumn("borda", (F.col("r1") + F.col("r2") + F.col("r3")).cast("long"))
    consensus = F.row_number().over(
        Window.partitionBy("grp").orderBy(
            F.col("borda").asc(), F.col("doc_id").asc_nulls_first()
        )
    )
    return (
        ranked.withColumn("consensus", consensus.cast("int"))
        .filter(F.col("consensus") <= top)
        .select(
            F.col("grp").alias(group_col),
            "doc_id",
            "n_chars",
            "n_words",
            "n_distinct",
            "borda",
            "consensus",
        )
    )


def rank_blend_oracle_sql(
    src: str = "documents",
    group_col: str = "lang",
    id_col: str = "doc_id",
    top: int = 5,
) -> str:
    """DuckDB replay of the identical signal + rank + Borda program."""
    return f"""
    with sig as (
        select {group_col} as grp, {id_col} as doc_id,
               cast(length(coalesce(text, '')) as bigint) as n_chars,
               cast(len(list_filter(string_split(coalesce(text, ''), ' '),
                    t -> t <> '')) as bigint) as n_words,
               cast(len(list_distinct(list_filter(
                    string_split(coalesce(text, ''), ' '), t -> t <> '')))
                    as bigint) as n_distinct
        from {src}),
    ranked as (
        select *,
               row_number() over (partition by grp
                   order by n_chars desc, doc_id nulls first) as r1,
               row_number() over (partition by grp
                   order by n_words desc, doc_id nulls first) as r2,
               row_number() over (partition by grp
                   order by n_distinct desc, doc_id nulls first) as r3
        from sig),
    borda as (
        select *, cast(r1 + r2 + r3 as bigint) as borda from ranked)
    select grp as {group_col}, doc_id, n_chars, n_words, n_distinct,
           borda, cast(consensus as int) as consensus
    from (
        select *, row_number() over (partition by grp
            order by borda asc, doc_id nulls first) as consensus
        from borda)
    where consensus <= {top}
    """
