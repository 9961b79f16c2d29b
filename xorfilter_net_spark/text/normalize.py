"""Text normalization + normalization-insensitive dedup.

Fuzzy-dedup preprocessing (the step in front of exact/MinHash dedup in
every production curation stack, e.g. RefinedWeb/FineWeb): fold case,
strip punctuation, collapse whitespace — then exact-dedup on the
normalized form, so trivially-reformatted copies (case changes, extra
spaces, punctuation drift) collapse to one canonical row while the
ORIGINAL text of the min-id survivor is preserved.

Everything is whole-stage-codegen string expressions built from a
dialect template (identical semantics in Spark SQL and DuckDB — the
regexes avoid any engine-specific class), so normalization adds zero
Python and zero shuffle; the dedup reuses the exact-dedup shape (one
hash-group shuffle on the normalized key).

No reference counterpart (mandated training-pipeline operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["normalize_expr", "with_normalized_text", "normalized_dedup"]


def normalize_expr(col: str, dialect: str = "spark") -> str:
    """Portable SQL fragment: lower → strip punct → collapse spaces.

    Same regex syntax evaluates identically in Spark (Java regex) and
    DuckDB (RE2): character classes and ``+`` only.
    """
    punct = r"[^a-z0-9 ]"
    # Spark's regexp_replace is global; DuckDB's replaces only the first
    # match unless the 'g' flag is passed
    g = ", 'g'" if dialect == "duckdb" else ""
    inner = f"lower(coalesce({col}, ''))"
    stripped = f"regexp_replace({inner}, '{punct}', ' '{g})"
    collapsed = f"regexp_replace({stripped}, ' +', ' '{g})"
    return f"trim({collapsed})"


def with_normalized_text(
    df: DataFrame, text_col: str = "text", out_col: str = "norm_text"
) -> DataFrame:
    return df.withColumn(out_col, F.expr(normalize_expr(text_col)))


def normalized_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Min-id survivor per normalized-content group; original columns
    preserved. Same one-shuffle shape as ``dedup/exact.py`` with the
    normalized form as the grouping content."""
    norm = with_normalized_text(df, text_col, "__norm")
    survivors = (
        norm.groupBy(F.xxhash64("__norm").alias("__h"), "__norm")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return survivors.join(df, id_col, "inner").select(*df.columns)


def normalized_dedup_sql(
    corpus_cte: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB oracle: identical normalization chain + min-id group."""
    norm = normalize_expr(text_col, dialect="duckdb")
    return (
        f"with corpus as ({corpus_cte}), "
        f"n as (select *, {norm} as __norm from corpus), "
        f"s as (select min({id_col}) as {id_col} from n group by __norm) "
        f"select c.* from corpus c join s using ({id_col})"
    )
