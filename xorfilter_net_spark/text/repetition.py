"""Repetition quality signals (Gopher-rule family, Rae et al. 2021 §A1.1).

Per-document repetition statistics used as training-data quality gates:
documents dominated by duplicated lines or by one repeated n-gram are
boilerplate/spam with high probability. Signals:

- ``n_lines``, ``dup_line_frac_e6`` — fraction of lines that are repeats
  of an earlier line (count-based);
- ``dup_line_char_frac_e6`` — fraction of line characters belonging to
  lines that occur more than once (every occurrence counted, the Gopher
  "duplicate line character fraction");
- ``n_bigrams``, ``top_bigram_count``, ``top_bigram_frac_e6`` — how much
  of the document the single most frequent word 2-gram covers.

All ratios are floored micro-units (bigint) so Spark and DuckDB agree
bit-for-bit.

Scale shape (100 TB):
- every line-level signal is MAP-ONLY whole-stage codegen: higher-order
  lambdas over the per-row line array (the per-line duplicate scan is
  O(L^2) in the row's own line count — rows are independent, no shuffle,
  no Python);
- the bigram mode needs cross-row nothing but per-doc grouping: explode
  -> partial map-side combine on (doc, gram) -> per-doc max/sum. The
  shuffle carries (doc_id, gram, partial_count) — repeats combine
  map-side, and at extreme scale the gram string can be replaced by
  ``xxhash64(gram)`` to shuffle 8 bytes/row (collision odds ~G^2/2^64
  per doc; kept as the string here so the DuckDB oracle is value-exact);
- the final join is aggregate-sized (one row per doc on both sides).

The reference has no text operators at all (SURVEY.md §2.2); this extends
the quality-scoring family (text/analysis.py) the training-pipeline
mandate requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MICRO = "cast(floor(1000000.0 * ({num}) / nullif({den}, 0)) as bigint)"


def _line_exprs_spark(text_col: str) -> dict[str, str]:
    lines = f"split({text_col}, '\\n')"
    n = f"size({lines})"
    n_dup = f"{n} - size(array_distinct({lines}))"
    total_chars = f"aggregate({lines}, 0L, (a, l) -> a + length(l))"
    dup_chars = (
        f"aggregate({lines}, 0L, (a, l) -> a + "
        f"if(size(filter({lines}, x -> x = l)) > 1, length(l), 0L))"
    )
    return {
        "n_lines": f"cast({n} as bigint)",
        "dup_line_frac_e6": _MICRO.format(num=n_dup, den=n),
        "dup_line_char_frac_e6": _MICRO.format(num=dup_chars, den=total_chars),
    }


def line_exprs_duckdb(text_col: str) -> dict[str, str]:
    """The same line signals as DuckDB SQL (oracle side)."""
    lines = f"string_split({text_col}, chr(10))"
    n = f"len({lines})"
    n_dup = f"{n} - len(list_distinct({lines}))"
    total_chars = f"list_sum(list_transform({lines}, l -> length(l)))"
    dup_chars = (
        f"coalesce(list_sum(list_transform({lines}, l -> "
        f"case when len(list_filter({lines}, x -> x = l)) > 1 "
        f"then length(l) else 0 end)), 0)"
    )
    return {
        "n_lines": f"cast({n} as bigint)",
        "dup_line_frac_e6": _MICRO.format(num=n_dup, den=n),
        "dup_line_char_frac_e6": _MICRO.format(num=dup_chars, den=total_chars),
    }


def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition signals; one row per input document."""
    line_stats = docs.selectExpr(
        id_col,
        *[
            f"{sql} as {name}"
            for name, sql in _line_exprs_spark(text_col).items()
        ],
    )
    # replace() is a LITERAL match (unlike split's regex), so the newline
    # must be spelled char(10), not the two-character '\n' literal
    words = f"split(replace({text_col}, char(10), ' '), ' ')"
    grams = (
        f"case when size({words}) >= 2 then "
        f"transform(sequence(0, size({words}) - 2), "
        f"i -> concat(element_at({words}, i + 1), ' ', "
        f"element_at({words}, i + 2))) "
        f"else array() end"
    )
    per_gram = (
        docs.selectExpr(id_col, f"explode({grams}) as gram")
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    bigram_stats = per_gram.groupBy(id_col).agg(
        F.max("cnt").alias("top_bigram_count"),
        F.sum("cnt").alias("n_bigrams"),
    )
    out = line_stats.join(bigram_stats, id_col, "left")
    return out.select(
        id_col,
        "n_lines",
        "dup_line_frac_e6",
        "dup_line_char_frac_e6",
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce("top_bigram_count", F.lit(0)).alias("top_bigram_count"),
        F.expr(
            _MICRO.format(num="top_bigram_count", den="n_bigrams")
        ).alias("top_bigram_frac_e6"),
    )
