"""Deterministic multi-turn transcripts source.

``BASELINE.json.input_hint`` mandates the input shape
``(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp)``. The sandbox testdata has no transcripts parquet, so we
derive the table *deterministically* from ``documents.parquet`` with
engine-portable SQL: the exact same derivation runs in Spark
(``load_transcripts``) and in DuckDB (``TRANSCRIPTS_CTE``, used by the
oracle queries), so correctness checks compare like for like.

Derivation (pure functions of doc_id/text — no randomness, no wall clock):
- each document becomes one conversation ``conv-<doc_id padded to 8>``
- ``1 + doc_id % 8`` turns; roles cycle user/assistant/tool
- turn text = ``substr(doc text, 1 + turn_idx*37, 96)`` — short docs yield
  empty-string turns, deliberately exercising the reference's empty-key
  edge case (DeterministicIntegrationTests.cs:216-229)
- ``ts_epoch = 1704067200 + doc_id*1000 + turn_idx`` (strictly increasing
  per (conv_id, turn_idx) — the stable-ordering invariant)

Conversation *lengths* are uniform-ish, but membership-key multiplicity is
Zipf-like in text content (documents share vocabulary), and the dedup
shuffle is salted downstream regardless (filters/spark_build.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# engine-portable projection fragments (valid Spark SQL *and* DuckDB SQL)
_PROJ = """
    'conv-' || lpad(cast(doc_id as string), 8, '0') as conv_id,
    cast(turn_idx as int) as turn_idx,
    case cast(turn_idx % 3 as int) when 0 then 'user' when 1 then 'assistant'
         else 'tool' end as role,
    substr(text, 1 + cast(turn_idx as int) * 37, 96) as text,
    case when turn_idx % 3 = 2 then 'tool_' || cast(doc_id % 5 as string)
         else null end as tool,
    cast(1704067200 + doc_id * 1000 + turn_idx as bigint) as ts_epoch
"""

# DuckDB flavor: unnest(generate_series(...)) expands one row per turn
TRANSCRIPTS_CTE = f"""
transcripts_base as (
    select doc_id, text,
           unnest(generate_series(0, (doc_id % 8)::bigint)) as turn_idx
    from documents
),
transcripts as (
    select {_PROJ}, cast(to_timestamp(1704067200 + doc_id * 1000 + turn_idx)
           as timestamp) as ts
    from transcripts_base
)
"""

# the canonical membership key: "has this (conv_id, text-fingerprint) been
# seen" (BASELINE.json north_star). Portable Spark/DuckDB SQL fragment.
KEY_EXPR = "conv_id || ':' || md5(coalesce(text, ''))"


def load_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark flavor of the same derivation (explode(sequence(...)))."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "_xfns_documents"
    )
    return spark.sql(
        f"""
        with transcripts_base as (
            select doc_id, text,
                   explode(sequence(0, cast(doc_id % 8 as int))) as turn_idx
            from _xfns_documents
        )
        select {_PROJ},
               timestamp_seconds(1704067200 + doc_id * 1000 + turn_idx) as ts
        from transcripts_base
        """
    )


def with_membership_key(df: DataFrame, out: str = "key") -> DataFrame:
    return df.selectExpr("*", f"{KEY_EXPR} as {out}")
