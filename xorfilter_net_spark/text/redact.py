"""PII-style text scrubbing for training-data pipelines.

Engine-portable like `analysis.py`: every redaction rule is a dialect
template rendered for Spark SQL (the engine) and DuckDB SQL (the
correctness oracle), so parity is by construction and the hot path is
100% whole-stage codegen `regexp_replace` chains — no Python UDFs.

Reference parity: the reference (XORFilter.Net) has no text operators at
all; this is a mandated training-data pipeline component (text cleanup
before dedup/tokenization). At 100 TB it is a map-only projection: no
shuffle, column pruning intact, throughput == scan bandwidth.

Pattern notes: all patterns are restricted to syntax with identical
semantics in Java regex (Spark) and RE2 (DuckDB) — character classes,
bounded repetition, alternation, `\\b` word boundaries; no lookaround or
backreferences. Rules apply in a fixed order (a match consumed by an
earlier rule is invisible to later ones — e.g. the userinfo of a URL),
and both engines do leftmost non-overlapping global replacement, so the
output string is bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied strictly in this order
REDACTION_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("card", r"\b[0-9]{13,16}\b", "<CARD>"),
    ("phone", r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
    ("hexkey", r"\b[0-9a-f]{32,}\b", "<KEY>"),
]


def _re_lit(dialect: str, pat: str) -> str:
    # Spark SQL processes backslash escapes inside string literals
    return "'" + (pat.replace("\\", "\\\\") if dialect == "spark" else pat) + "'"


def _replace(dialect: str, col: str, pat: str, rep: str) -> str:
    lit = _re_lit(dialect, pat)
    if dialect == "spark":
        return f"regexp_replace({col}, {lit}, '{rep}')"
    return f"regexp_replace({col}, {lit}, '{rep}', 'g')"


def _count(dialect: str, col: str, pat: str) -> str:
    lit = _re_lit(dialect, pat)
    if dialect == "spark":
        return f"cast(size(regexp_extract_all({col}, {lit}, 0)) as bigint)"
    return f"cast(len(regexp_extract_all({col}, {lit}, 0)) as bigint)"


def redact_exprs(dialect: str, col: str = "text") -> dict[str, str]:
    """name -> SQL expression for the redacted text plus one match-count
    column per rule (counts measured on the ORIGINAL text, before any
    rule consumes characters — they report what was present, not what a
    previous rule left behind)."""
    out: dict[str, str] = {}
    redacted = col
    for _, pat, rep in REDACTION_RULES:
        redacted = _replace(dialect, redacted, pat, rep)
    out["redacted"] = redacted
    for name, pat, _ in REDACTION_RULES:
        out[f"n_{name}"] = _count(dialect, col, pat)
    return out


def redact_text(df: DataFrame, col: str = "text") -> DataFrame:
    """Append `redacted` + per-rule `n_<rule>` columns. Map-only, all
    codegen; staged so the original column is read once per expression
    (Catalyst collapses the projection chain)."""
    exprs = redact_exprs("spark", col)
    return df.select("*", *(F.expr(e).alias(n) for n, e in exprs.items()))
