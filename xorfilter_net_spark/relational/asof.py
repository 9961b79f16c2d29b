"""As-of (point-in-time) join.

Absent in the reference (a membership library; SURVEY.md §2.2 "Joins:
absent") and absent as a Spark verb, but ubiquitous in event/feature
pipelines: for every left row, attach the latest right row with the same
key whose timestamp is <= the left row's timestamp.

Scale shape: the naive formulations are a range join (O(n*m) cartesian
per key) or a per-key ``collect_list`` (OOM on hot keys). This one is a
single shuffle with no UDF and no per-key materialization:

1. union both sides with a side tag (right sorts before left at equal
   timestamps, so ties match "<=");
2. one window partitioned by key, ordered by (ts, side), carrying the
   right-side payload forward with ``last(..., ignorenulls=True)`` over
   ``rowsBetween(unboundedPreceding, currentRow)`` — Spark evaluates
   this as a running accumulator inside a single sort-based window pass
   (no re-scan per row);
3. keep the left rows.

Cost at 100 TB: one hash-partition shuffle of (left + right) on the key
plus a per-partition sort — the same cost as the sort-merge join Spark
would run anyway, with skew bounded by per-key row counts (AQE skew
handling applies to the shuffle like any other).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    payload_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each ``left`` row, attach the most recent ``right`` row per
    ``on`` key with ``right.ts <= left.ts`` (latest-prior-or-equal).

    ``payload_cols`` are the right-side columns to carry (default: all
    non-key, non-ts columns); they come back suffixed, plus
    ``{ts}{suffix}`` for the matched timestamp, all NULL when no right
    row precedes the left row.
    """
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (on, ts)]

    carried = [f"{ts}{suffix}"] + [f"{c}{suffix}" for c in payload_cols]
    l_tag = left.select(
        F.col(on).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__row"),
        F.lit(None).cast(right.schema[ts].dataType).alias(carried[0]),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
            for c in payload_cols
        ],
    )
    r_tag = right.select(
        F.col(on).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tag.schema["__row"].dataType).alias("__row"),
        F.col(ts).alias(carried[0]),
        *[F.col(c).alias(f"{c}{suffix}") for c in payload_cols],
    )
    # right rows (__side=0) sort before left rows at equal __ts, so an
    # exactly-simultaneous right row is visible to the left row (<=)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tag.unionByName(r_tag).select(
        "__side",
        "__row",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carried],
    )
    return filled.filter("__side = 1").select("__row.*", *carried)
