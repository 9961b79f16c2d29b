"""Python UDTFs (user-defined TABLE functions) — the one lateral surface
JVM generators can't cover.

Design rule (SURVEY.md §2.2): row fan-out at corpus scale belongs to
JVM-side ``explode``/``posexplode`` over codegen expressions
(q_explode_token_counts, text/chunking.py) — a Python UDTF pays the
Python-worker round trip per row group and is never the hot path. The
UDTF surface exists for semantics SQL genuinely cannot express. The
canonical case here: **token spans** — each token with its character
offsets. ``regexp_extract_all`` yields the tokens but discards
positions; offsets are what alignment, redaction, and span-labeling
pipelines need.

``TokenSpans`` is registered with ``spark.udtf.register`` so it works in
SQL as a lateral table function::

    SELECT d.doc_id, t.token, t.start, t.end
    FROM documents d, LATERAL token_spans(d.text) t

The aggregate view of its output (token multiset per document) is
oracle-checked against ``regexp_extract_all`` in DuckDB
(q_token_spans_stats); the offsets themselves are pinned by unit tests
(tests/test_text.py).
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

# Same token regex the SQL text features use, so the UDTF's token
# stream matches regexp_extract_all exactly (imported, not copied —
# drift would silently break the oracle).
from ..text.analysis import TOKEN_RE

_TOKEN_PAT = re.compile(TOKEN_RE)


@udtf(returnType="pos int, token string, start int, end int")
class TokenSpans:
    """Yield (pos, token, start, end) per token; ``end`` is exclusive.

    Offsets are Python string (code-point) indexes — identical to Spark
    SQL ``substring`` semantics on the same column, so
    ``substring(text, start + 1, end - start) == token`` holds row-for-row
    (asserted in tests).
    """

    def eval(self, text: str | None):  # noqa: D102 (UDTF contract method)
        if not text:
            return
        for pos, m in enumerate(_TOKEN_PAT.finditer(text)):
            yield pos, m.group(0), m.start(), m.end()


def register_token_spans_udtf(spark: SparkSession, name: str = "token_spans"):
    spark.udtf.register(name, TokenSpans)


def token_spans(spark: SparkSession, df, text_col: str = "text", id_col: str = "doc_id"):
    """Lateral-join ``df`` with the token-span UDTF -> one row per token."""
    register_token_spans_udtf(spark)
    df.createOrReplaceTempView("__token_spans_src")
    return spark.sql(
        f"select s.{id_col}, t.pos, t.token, t.start, t.end "
        f"from __token_spans_src s, lateral token_spans(s.{text_col}) t"
    )


_FIELD_RE = re.compile(r"(\w+)=((?:\\.|[^,\\])*)")


@udtf
class ExtractFields:
    """Polymorphic UDTF (Spark 4 static ``analyze``): parse ``k=v``
    pair strings (the tool-call argument encoding in transcript logs)
    into the caller-chosen columns::

        SELECT t.* FROM logs, LATERAL extract_fields(args, 'path,mode') t

    The output schema is computed at PLAN time from the constant field
    list — each requested name becomes a string column (missing keys →
    null) — so downstream pruning/pushdown sees real columns, not a
    map blob. A non-constant field list is rejected during analysis,
    exactly like a malformed SQL reference (fail at plan, not per-row).
    """

    @staticmethod
    def analyze(text, fields):
        from pyspark.sql.types import StringType, StructField, StructType
        from pyspark.sql.udtf import AnalyzeResult

        if not fields.isConstantExpression or not isinstance(
            fields.value, str
        ):
            raise ValueError(
                "extract_fields(text, fields): `fields` must be a constant "
                "comma-separated string of column names"
            )
        names = [f.strip() for f in fields.value.split(",") if f.strip()]
        if not names:
            raise ValueError("extract_fields: empty field list")
        return AnalyzeResult(
            schema=StructType(
                [StructField(n, StringType()) for n in names]
            )
        )

    def eval(self, text: str | None, fields: str):
        names = [f.strip() for f in fields.split(",") if f.strip()]
        if text is None:
            yield tuple(None for _ in names)
            return
        d = {m.group(1): m.group(2) for m in _FIELD_RE.finditer(text)}
        yield tuple(d.get(n) for n in names)


def register_extract_fields_udtf(
    spark: SparkSession, name: str = "extract_fields"
):
    spark.udtf.register(name, ExtractFields)
