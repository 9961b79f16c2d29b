"""Slowly-changing-dimension (SCD Type 2) history build — turn a change
stream of (key, attribute, ts) records into versioned dimension rows
(key, attr, valid_from, valid_to, is_current) with change suppression:
consecutive records carrying the SAME attribute value collapse into one
validity interval (the standard warehouse semantics — a no-op update
does not open a new version).

Shape: two window passes over ONE partitioning (key, ordered by event
time with a total-order tiebreak column the caller supplies — ties
otherwise make "previous value" engine-dependent): pass 1 drops rows
equal to their predecessor (``lag``), pass 2 closes each surviving
version with its successor's start (``lead``; NULL = still open). One
shuffle total; per-key state inside the window is O(1) (lag/lead of
adjacent rows only). Timestamps are integer epoch-micros throughout.

NULL attribute values are legal change records: change suppression
compares with null-safe equality (``<=>``), so NULL -> NULL collapses
and NULL -> x opens a version, matching MERGE-based SCD2 loaders.

At 10^12-row change feeds this is the bulk-(re)build path; the
incremental path is the versioned table's MERGE INTO (sources/upsert.py)
applying only the newest deltas against current rows.

No reference counterpart (beyond-reference warehouse family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["scd2_history", "temporal_join"]


def scd2_history(
    changes: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """(key, attr, valid_from_us, valid_to_us, is_current) — one row per
    suppressed-change version, ordered intervals per key; valid_to_us is
    NULL on each key's open (current) version."""
    ev = changes.select(
        F.col(key_col).alias("key"),
        F.col(attr_col).alias("attr"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
        F.col(tiebreak_col).alias("tb"),
    ).filter(F.col("key").isNotNull() & F.col("t").isNotNull())
    w = Window.partitionBy("key").orderBy("t", "tb")
    changed = (
        ev.withColumn("prev", F.lag("attr").over(w))
        # rn distinguishes lag's first-row miss from a genuine NULL attr
        .withColumn("rn", F.row_number().over(w))
        .filter(
            (F.col("rn") == 1) | ~F.col("attr").eqNullSafe(F.col("prev"))
        )
    )
    w2 = Window.partitionBy("key").orderBy("t", "tb")
    return changed.select(
        "key",
        "attr",
        F.col("t").alias("valid_from_us"),
        F.lead("t").over(w2).alias("valid_to_us"),
        F.lead("t").over(w2).isNull().alias("is_current"),
    )


def temporal_join(
    fact: DataFrame,
    dim_history: DataFrame,
    fact_key: str,
    fact_ts: str,
    dim_key: str = "key",
) -> DataFrame:
    """Point-in-time join of fact rows against an SCD2 history (as
    produced by ``scd2_history``): each fact row picks the dimension
    version whose ``[valid_from_us, valid_to_us)`` interval contains its
    event time — the standard warehouse "join to the dimension AS OF the
    fact's timestamp".

    Shape: hash equi-join on the key with the interval predicate as a
    residual filter — the right plan when versions-per-key is small
    (the SCD2 norm): the join fans out to the key's version count and
    the residual keeps exactly one row, so output cardinality == fact
    cardinality with no shuffle beyond the key join (broadcast when the
    dimension fits). For pathological version counts, the as-of
    union+window shape (relational/asof.py) is the fallback — same
    semantics, one shuffle, no fan-out.

    Returns every fact column plus the dimension's ``attr`` and version
    interval. Fact rows with no covering version (key unseen, or ts
    before the first version) are dropped (inner semantics).
    """
    f = fact.withColumn(
        "__t", F.unix_micros(F.col(fact_ts).cast("timestamp"))
    )
    d = dim_history.select(
        F.col(dim_key).alias("__k"),
        "attr",
        "valid_from_us",
        "valid_to_us",
    )
    cond = (
        (F.col(fact_key) == F.col("__k"))
        & (F.col("valid_from_us") <= F.col("__t"))
        & (
            F.col("valid_to_us").isNull()
            | (F.col("__t") < F.col("valid_to_us"))
        )
    )
    return f.join(d, cond, "inner").drop("__k", "__t")
