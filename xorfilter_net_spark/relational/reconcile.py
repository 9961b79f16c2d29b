"""Order-independent table reconciliation — replica diff without a join.

Verifying that two copies of a table (a migrated dataset, a replicated
snapshot, yesterday's backup) hold the same rows is an everyday 100 TB
operation, and the naive full outer join is by far the most expensive
way to do it. The standard trick: each side reduces to ONE small
digest table — per-bucket row counts and an ORDER-INDEPENDENT XOR of
per-row content hashes — and only the digest tables are compared.
Matching buckets are certified without moving any rows; differing
buckets localize the damage to an O(table/n_buckets) slice that a
targeted join can then inspect.

Scale shape: each side is one map-only pass (row hash + bucket id in
codegen) + one n_buckets-bounded aggregate; the comparison is a join
of two n_buckets-row tables. Nothing corpus-sized ever shuffles or
crosses sides. XOR is associative/commutative/self-inverse, so the
digest is partitioning- and order-invariant, and a row present on both
sides cancels exactly.

Hash is the engine-portable md5 idiom (first 15 hex chars as a 60-bit
int — the repo's cross-engine convention; xxhash64 exists only in
Spark), so the DuckDB oracle replays the identical arithmetic. Fields
are individually md5'd before concatenation (fixed-width encoding +
non-hex NULL sentinel), so the row encoding is prefix-free: no two
distinct rows share an encoded string. Collision note: a bucket
mismatch is NEVER spurious (hash is a pure function of content); a
masked difference needs two rows whose digests XOR to zero within one
bucket (~2^-60 per bucket pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_digest(cols: list[str]):
    # Each field is md5'd BEFORE concatenation so field boundaries are
    # unambiguous: every encoded field is exactly 32 hex chars (or the
    # 1-char NULL sentinel 'N', which no md5 can produce), so rows
    # differing only in where a separator-like byte falls — or in NULL
    # vs a literal sentinel string — can never digest identically.
    # (A raw concat_ws('\\x1f', ...) aliased ('a\\x1fb','c') with
    # ('a','b\\x1fc') deterministically, defeating the 2^-60 claim.)
    joined = F.concat_ws(
        "\x1f",
        *[F.coalesce(F.md5(F.col(c).cast("string")), F.lit("N")) for c in cols],
    )
    return F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("long")


def bucket_digests(
    df: DataFrame,
    cols: list[str],
    key_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """(bucket, n_rows, xor_digest) — one row per bucket. ``key_col``
    places a row deterministically (pmod of its md5 int), ``cols`` is
    the compared content (order matters only for digest definition,
    not row order)."""
    d = _row_digest(cols)
    # NULL keys get a sentinel so they land in a REAL bucket — md5(NULL)
    # would yield a NULL bucket that never equals itself in the
    # full-outer compare, reporting spurious mismatches for identical
    # replicas
    key_s = F.coalesce(F.col(key_col).cast("string"), F.lit("\x00"))
    b = F.pmod(
        F.conv(F.substring(F.md5(key_s), 1, 15), 16, 10).cast("long"),
        F.lit(n_buckets),
    )
    return (
        df.select(b.alias("bucket"), d.alias("__d"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.expr("bit_xor(__d)").cast("long").alias("xor_digest"),
        )
    )


def reconcile_tables(
    a: DataFrame,
    b: DataFrame,
    cols: list[str],
    key_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Per-bucket comparison of two tables:
    (bucket, n_a, n_b, digest_match, rows_match) — ``rows_match`` is
    count AND digest equality; absent buckets surface as 0-row sides
    (full outer on bucket)."""
    da = bucket_digests(a, cols, key_col, n_buckets).withColumnsRenamed(
        {"n_rows": "n_a", "xor_digest": "__xa"}
    )
    db = bucket_digests(b, cols, key_col, n_buckets).withColumnsRenamed(
        {"n_rows": "n_b", "xor_digest": "__xb"}
    )
    j = da.join(db, "bucket", "full_outer")
    n_a = F.coalesce(F.col("n_a"), F.lit(0))
    n_b = F.coalesce(F.col("n_b"), F.lit(0))
    xa = F.coalesce(F.col("__xa"), F.lit(0))
    xb = F.coalesce(F.col("__xb"), F.lit(0))
    return j.select(
        "bucket",
        n_a.alias("n_a"),
        n_b.alias("n_b"),
        (xa == xb).alias("digest_match"),
        ((n_a == n_b) & (xa == xb)).alias("rows_match"),
    )


def digest_sql(
    src: str,
    cols: list[str],
    key_col: str,
    n_buckets: int = 64,
) -> str:
    """DuckDB replay of :func:`bucket_digests` (identical md5/XOR
    arithmetic) as a SELECT string."""
    joined = " || chr(31) || ".join(
        f"coalesce(md5(cast({c} as varchar)), 'N')" for c in cols
    )
    d = f"cast(('0x' || substr(md5({joined}), 1, 15))::bigint as bigint)"
    b = (
        f"cast(('0x' || substr(md5(coalesce(cast({key_col} as varchar), "
        f"chr(0))), 1, 15))::bigint as bigint) % {n_buckets}"
    )
    return (
        f"select {b} as bucket, cast(count(*) as bigint) as n_rows, "
        f"cast(bit_xor({d}) as bigint) as xor_digest "
        f"from {src} group by 1"
    )
