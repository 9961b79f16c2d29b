"""Exact deduplication — distributed hash-groupBy, canonical-survivor.

The 100 TB shape: group on a 64-bit content hash (xxhash64, JVM-side) so
the shuffle carries (hash, id) instead of full texts; survivors join back
for payload. Hash collisions are resolved by a second exact-equality
group on the (tiny) colliding remainder — at 2^64 this never triggers in
practice but keeps the operator exact by contract, mirroring the
reference's two-level dedup (ByteArrayEqualityComparer.cs:30-37: XXHash64
bucket + element-wise equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(
    df: DataFrame, id_col: str, content_cols: list[str]
) -> DataFrame:
    """Keep the min-id row per distinct content. Returns the full rows of
    survivors (all original columns)."""
    h = F.xxhash64(*content_cols)
    hashed = df.withColumn("__h", h)
    # min-id per (hash, exact content): grouping includes the content
    # columns themselves, so colliding-but-different rows both survive
    survivors = hashed.groupBy("__h", *content_cols).agg(
        F.min(id_col).alias(id_col)
    )
    return (
        survivors.select(id_col)
        .join(df, id_col, "inner")
        .select(*df.columns)
    )


def duplicate_stats(df: DataFrame, content_cols: list[str]) -> DataFrame:
    """(n_rows, n_distinct, n_dup_rows) — one-pass aggregate."""
    h = F.xxhash64(*content_cols)
    per = df.select(h.alias("__h"), *content_cols).groupBy(
        "__h", *content_cols
    ).count()
    return per.agg(
        F.sum("count").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct"),
        (F.sum("count") - F.count(F.lit(1))).alias("n_dup_rows"),
    )
