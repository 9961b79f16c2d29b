"""ExactSubstr-style duplicated n-gram span detection (training-data op).

Finds every maximal token span whose k-grams occur more than once in the
corpus — the distributed counterpart of the suffix-array ExactSubstr
dedup of Lee et al., "Deduplicating Training Data Makes Language Models
Better" (ACL 2022). A suffix array is inherently a single-machine
structure; the scalable shape is k-gram inversion:

1. **gram stream** (map-only, pure codegen): ``posexplode`` one row per
   token position, gram = ``array_join(slice(tokens, pos+1, k))``. No
   Python, no shuffle; Catalyst prunes columns through the generator.
2. **duplicated-gram set** (one shuffle on the gram): ``groupBy(gram)``
   keeping grams with total occurrence count ≥ 2 (within-doc repeats
   count, matching ExactSubstr). The shuffle row is the k-token gram
   string + int64s; at extreme scale pass ``carry='hash'`` to shuffle
   only ``xxhash64(gram)`` (exact up to a 2^-64 collision — the same
   trade the reference's dedup comparer makes before its equality pass,
   ByteArrayEqualityComparer.cs:30-37).
3. **hit join** (co-partitioned on the same key, AQE-sized): gram
   occurrences ⋈ duplicated grams → (doc, pos) hits.
4. **interval union** (one shuffle on doc_id): each hit covers tokens
   ``[pos, pos+k-1]``; maximal spans via the running-max window trick —
   a hit starts a new span iff ``pos > max(prev pos) + k - 1``. All
   integer arithmetic, bit-identical in any engine.

Per-doc span counts are bounded by doc length, so the window state and
the strip-stage per-doc aggregation are O(doc), never O(corpus) — the
only corpus-sized states are hash-partitioned groupBys.

No reference counterpart (the reference is membership-only; this is a
mandated training-pipeline operator). Oracle: the same arithmetic as a
DuckDB CTE chain (``unnest(range())`` shingles + window interval union).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _gram_stream(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(id, pos, gram) — one row per token position with its k-gram.

    Docs shorter than k tokens emit nothing (they cannot contain a
    duplicated k-gram).
    """
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    n = F.size(toks)
    # guard: sequence(0, -m) would count DOWN; emit an empty array instead
    positions = F.when(
        n >= k, F.sequence(F.lit(0), n - F.lit(k))
    ).otherwise(F.expr("array()"))
    return (
        df.select(F.col(id_col), toks.alias("__t"), positions.alias("__p"))
        .select(
            id_col,
            F.posexplode("__p").alias("__i", "pos"),
            F.col("__t"),
        )
        .select(
            id_col,
            "pos",
            F.array_join(F.slice("__t", F.col("pos") + 1, k), " ").alias(
                "gram"
            ),
        )
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    min_count: int = 2,
    carry: str = "gram",
) -> DataFrame:
    """Maximal duplicated token spans per document.

    Returns (id_col, span_start, span_end, span_tokens): 0-based
    inclusive token indices of each maximal span all of whose length-k
    windows occur ≥ ``min_count`` times corpus-wide.

    ``carry='gram'`` shuffles the gram string (exact by contract);
    ``carry='hash'`` shuffles only ``xxhash64(gram)`` — the 100 TB mode,
    exact up to a 2^-64 hash collision.
    """
    if carry not in ("gram", "hash"):
        raise ValueError(f"carry must be 'gram' or 'hash', got {carry!r}")
    grams = _gram_stream(df, id_col, text_col, k)
    if carry == "hash":
        grams = grams.select(
            id_col, "pos", F.xxhash64("gram").alias("gram")
        )
    dup = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= min_count)
        .select("gram")
    )
    hits = grams.join(dup, "gram").select(id_col, "pos")

    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # new span iff this hit's window [pos, pos+k-1] does not touch any
    # earlier hit's window; prev-max NULL (first row) compares NULL ->
    # otherwise(1) starts the first span
    new_span = (
        F.when(F.col("pos") <= F.max("pos").over(w_prev) + (k - 1), 0)
        .otherwise(1)
    )
    return (
        hits.withColumn("__n", new_span)
        .withColumn("__island", F.sum("__n").over(w_cum))
        .groupBy(id_col, "__island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (k - 1)).alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias(
                "span_tokens"
            ),
        )
    )


def strip_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    min_count: int = 2,
    carry: str = "gram",
    out_col: str = "clean_text",
) -> DataFrame:
    """Remove every duplicated span's tokens, keeping the rest in order.

    Returns (id_col, out_col, kept_tokens, dropped_tokens). Documents
    with no duplicated span pass through unchanged (left join). The
    rebuild is per-document work: covered positions come from a bounded
    ``sequence`` explode of the doc's own spans, and the kept tokens
    re-assemble via ``array_sort(collect_list(struct(pos, token)))`` —
    state O(doc length), independent of corpus size.
    """
    spans = duplicated_spans(df, id_col, text_col, k, min_count, carry)
    covered = spans.select(
        id_col,
        F.explode(
            F.sequence(F.col("span_start"), F.col("span_end"))
        ).alias("pos"),
    ).distinct()

    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    positions = df.select(
        F.col(id_col),
        F.posexplode(toks).alias("pos", "token"),
    )
    kept = positions.join(covered, [id_col, "pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "token"))),
                lambda s: s["token"],
            ),
            " ",
        ).alias(out_col),
        F.count(F.lit(1)).alias("kept_tokens"),
    )
    totals = df.select(
        F.col(id_col), F.size(toks).alias("__total")
    )
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col(out_col), F.lit("")).alias(out_col),
            F.coalesce("kept_tokens", F.lit(0)).alias("kept_tokens"),
            (
                F.col("__total")
                - F.coalesce("kept_tokens", F.lit(0))
            ).alias("dropped_tokens"),
        )
    )


def duplicated_spans_sql(
    corpus_cte: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    min_count: int = 2,
) -> str:
    """DuckDB oracle for :func:`duplicated_spans` (same arithmetic)."""
    return (
        f"with corpus as ({corpus_cte}), "
        f"tk as (select {id_col}, string_split({text_col}, ' ') as t from corpus), "
        f"grams as (select {id_col}, i as pos, "
        f"array_to_string(t[i+1:i+{k}], ' ') as gram "
        f"from tk, unnest(range(0, greatest(len(t) - {k} + 1, 0))) as u(i)), "
        f"dup as (select gram from grams group by gram "
        f"having count(*) >= {min_count}), "
        f"hits as (select {id_col}, pos from grams join dup using (gram)), "
        f"flagged as (select {id_col}, pos, case when pos <= "
        f"max(pos) over (partition by {id_col} order by pos "
        f"rows between unbounded preceding and 1 preceding) + {k - 1} "
        f"then 0 else 1 end as n from hits), "
        f"islands as (select {id_col}, pos, sum(n) over "
        f"(partition by {id_col} order by pos "
        f"rows between unbounded preceding and current row) as island "
        f"from flagged), "
        f"spans as (select {id_col}, min(pos) as span_start, "
        f"max(pos) + {k - 1} as span_end from islands "
        f"group by {id_col}, island) "
        f"select {id_col}, span_start, span_end, "
        f"span_end - span_start + 1 as span_tokens from spans"
    )


def strip_spans_sql(
    corpus_cte: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    min_count: int = 2,
    out_col: str = "clean_text",
) -> str:
    """DuckDB oracle for :func:`strip_duplicated_spans`."""
    spans = duplicated_spans_sql(corpus_cte, id_col, text_col, k, min_count)
    return (
        f"with spans as ({spans}), "
        f"corpus as ({corpus_cte}), "
        f"covered as (select distinct {id_col}, span_start + i as pos "
        f"from spans, unnest(range(0, span_end - span_start + 1)) as u(i)), "
        f"tk as (select {id_col}, string_split({text_col}, ' ') as t from corpus), "
        f"positions as (select {id_col}, i as pos, t[i+1] as token "
        f"from tk, unnest(range(0, len(t))) as u(i)), "
        f"kept as (select p.{id_col}, p.pos, p.token from positions p "
        f"anti join covered c using ({id_col}, pos)), "
        f"rebuilt as (select {id_col}, "
        f"string_agg(token, ' ' order by pos) as {out_col}, "
        f"count(*) as kept_tokens from kept group by {id_col}), "
        f"totals as (select {id_col}, len(string_split({text_col}, ' ')) "
        f"as total from corpus) "
        f"select t.{id_col}, coalesce(r.{out_col}, '') as {out_col}, "
        f"coalesce(r.kept_tokens, 0) as kept_tokens, "
        f"t.total - coalesce(r.kept_tokens, 0) as dropped_tokens "
        f"from totals t left join rebuilt r using ({id_col})"
    )
