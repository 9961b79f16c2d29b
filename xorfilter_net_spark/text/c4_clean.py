"""C4-style line-level cleaning (Raffel et al., JMLR'20 §2.2).

The C4 corpus rules, the most widely replicated web-text cleaning
recipe: keep only lines that (a) end in a terminal punctuation mark,
(b) contain at least ``min_words`` words, (c) do not mention
"javascript"; drop whole documents that contain a curly brace (code
leakage) or the "lorem ipsum" placeholder, or whose kept-line count
falls below ``min_kept_lines``.

Scale shape: 100% map-only whole-stage codegen — one ``split`` on
newlines and a handful of higher-order ``filter``/``size`` lambdas per
row; ZERO shuffles, zero Python. At 100 TB this is a pure scan-side
transform that fuses below whatever consumes it (compose it before a
dedup and the cleaned text is what gets deduplicated, at no extra
pass — Catalyst collapses the projections).

Every rule is dialect-templated (Spark HOFs here, the DuckDB list
lambdas in ``c4_oracle_tail``) so the driver oracle replays the exact
program. No reference counterpart (mandated training-pipeline
adjacency; the C4 rules are public from the T5 paper).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TERMINAL = (".", "!", "?", '"')


def _is_kept_line(line: Column, min_words: int) -> Column:
    last = F.substring(line, -1, 1)
    n_words = F.size(F.filter(F.split(line, " "), lambda w: w != ""))
    return (
        last.isin(*TERMINAL)
        & (n_words >= min_words)
        & ~F.contains(F.lower(line), F.lit("javascript"))
    )


def c4_line_clean(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 3,
    min_kept_lines: int = 1,
) -> DataFrame:
    """Per-document C4 cleaning report + cleaned text.

    Output columns: n_lines, n_kept, n_no_terminal, n_short,
    n_javascript (per-rule line counts — a line can fail several
    rules), has_brace, has_lorem (document-level flags), keep_doc,
    cleaned_text (kept lines re-joined; null when the doc is dropped).
    """
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
    kept = F.filter(lines, lambda l: _is_kept_line(l, min_words))
    n_words = lambda l: F.size(F.filter(F.split(l, " "), lambda w: w != ""))
    lower_text = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    out = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.size(
            F.filter(lines, lambda l: ~F.substring(l, -1, 1).isin(*TERMINAL))
        ).cast("long").alias("n_no_terminal"),
        F.size(
            F.filter(lines, lambda l: n_words(l) < min_words)
        ).cast("long").alias("n_short"),
        F.size(
            F.filter(
                lines, lambda l: F.contains(F.lower(l), F.lit("javascript"))
            )
        ).cast("long").alias("n_javascript"),
        F.contains(
            F.coalesce(F.col(text_col), F.lit("")), F.lit("{")
        ).alias("has_brace"),
        F.contains(lower_text, F.lit("lorem ipsum")).alias("has_lorem"),
        F.array_join(kept, "\n").alias("_cleaned"),
    )
    keep = (
        (F.col("n_kept") >= min_kept_lines)
        & ~F.col("has_brace")
        & ~F.col("has_lorem")
    )
    return out.withColumn("keep_doc", keep).withColumn(
        "cleaned_text", F.when(keep, F.col("_cleaned"))
    ).drop("_cleaned")


def c4_oracle_tail(
    src: str = "documents",
    min_words: int = 3,
    min_kept_lines: int = 1,
) -> str:
    """DuckDB replay of the identical rule program, returned as a CTE
    tail (caller prefixes ``with <seeded-source CTEs>,``)."""
    terminals = ", ".join(f"'{t}'" for t in TERMINAL if t != '"') + ", '\"'"
    kept_line = (
        f"(right(l, 1) in ({terminals}) "
        f"and len(list_filter(string_split(l, ' '), w -> w <> '')) "
        f">= {min_words} "
        f"and not contains(lower(l), 'javascript'))"
    )
    return f"""
    lined as (
        select doc_id, string_split(coalesce(text, ''), chr(10)) as ls,
               coalesce(text, '') as t0
        from {src}),
    scored as (
        select doc_id,
               cast(len(ls) as bigint) as n_lines,
               cast(len(list_filter(ls, l -> {kept_line})) as bigint)
                   as n_kept,
               cast(len(list_filter(ls, l ->
                   right(l, 1) not in ({terminals}))) as bigint)
                   as n_no_terminal,
               cast(len(list_filter(ls, l ->
                   len(list_filter(string_split(l, ' '), w -> w <> ''))
                   < {min_words})) as bigint) as n_short,
               cast(len(list_filter(ls, l ->
                   contains(lower(l), 'javascript'))) as bigint)
                   as n_javascript,
               contains(t0, '{{') as has_brace,
               contains(lower(t0), 'lorem ipsum') as has_lorem,
               array_to_string(list_filter(ls, l -> {kept_line}), chr(10))
                   as cleaned0
        from lined)
    select doc_id, n_lines, n_kept, n_no_terminal, n_short, n_javascript,
           has_brace, has_lorem,
           (n_kept >= {min_kept_lines} and not has_brace and not has_lorem)
               as keep_doc,
           case when n_kept >= {min_kept_lines}
                     and not has_brace and not has_lorem
                then cleaned0 end as cleaned_text
    from scored
    """
