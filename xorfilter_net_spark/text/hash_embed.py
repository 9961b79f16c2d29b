"""Feature-hashed text embeddings — the hashing trick (Weinberger et al.
ICML'09): tokens hash into a fixed-dimension count vector, l2-normalized
into an ``array<double>`` embedding column. Deterministic, training-free,
engine-portable — the plumbing that lets RAW TEXT flow into the ANN /
semantic-dedup family (ann/*, dedup/semantic.py), which otherwise needs
a precomputed embedding column.

Everything is whole-stage codegen, zero Python:

  - bucket assignment: 4 hex digits of ``md5(token)`` decoded with the
    portable ``instr('0123456789abcdef', ...)`` idiom (no engine-specific
    hash function; the DuckDB oracle runs the identical expression) and
    reduced mod ``dim``;
  - the sparse->dense step: ``map_from_entries(collect_list(...))`` per
    doc, expanded by a ``transform(sequence(...))`` lambda;
  - l2 normalization: ``aggregate`` + ``transform`` lambdas.

The INTEGER (id, bucket, count) view is the oracle surface (value-exact
in both engines); the float normalization lives only in the embedding
consumed by ANN kernels (the repo's standing ulp discipline: floats
never cross an exact-compare boundary).

Cosine between hash embeddings estimates token-multiset cosine with
O(1/sqrt(dim)) collision distortion — plenty to rank near-duplicates
first, which the registered gate checks end to end.

No reference counterpart (beyond-reference text/ANN bridge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bucket_sql", "token_bucket_counts", "hash_embeddings"]


def bucket_sql(token_expr: str, dim: int) -> str:
    """Engine-portable SQL: 16-bit md5-derived bucket of a token expr,
    mod ``dim``. Valid verbatim in Spark SQL and DuckDB."""
    h = f"md5({token_expr})"
    v = [
        f"(instr('0123456789abcdef', substr({h}, {i}, 1)) - 1)"
        for i in (1, 2, 3, 4)
    ]
    return f"((({v[0]} * 16 + {v[1]}) * 16 + {v[2]}) * 16 + {v[3]}) % {dim}"


def token_bucket_counts(
    df: DataFrame, id_col: str, text_col: str, dim: int = 256
) -> DataFrame:
    """(id, bucket, cnt) — the exact integer sparse vector per doc."""
    if dim < 2 or dim > 65536:
        raise ValueError("dim must be in [2, 65536]")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    return (
        toks.select("id", F.expr(bucket_sql("tok", dim)).alias("bucket"))
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hash_embeddings(
    df: DataFrame, id_col: str, text_col: str, dim: int = 256
) -> DataFrame:
    """(id, embedding array<double>) — l2-normalized hashed count
    vectors; docs with zero tokens are dropped (no direction)."""
    counts = token_bucket_counts(df, id_col, text_col, dim)
    m = F.map_from_entries(
        F.collect_list(F.struct("bucket", "cnt"))
    )
    dense = F.expr(
        f"transform(sequence(0, {dim - 1}), "
        "i -> cast(coalesce(element_at(__m, i), 0) as double))"
    )
    return (
        counts.groupBy("id")
        .agg(m.alias("__m"))
        .withColumn("__arr", dense)
        .withColumn(
            "__norm",
            F.sqrt(F.expr("aggregate(__arr, 0D, (a, x) -> a + x * x)")),
        )
        .select(
            "id",
            F.expr("transform(__arr, x -> x / __norm)").alias("embedding"),
        )
    )
