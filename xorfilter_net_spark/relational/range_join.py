"""Binned interval (range) join.

``points.join(intervals, (ts >= start) & (ts < end))`` has no equi-key,
so Catalyst plans a BroadcastNestedLoopJoin — O(points x intervals) work
that only finishes when one side is tiny. The standard scale-out shape
is binning:

1. pick a bucket width W (seconds);
2. explode each interval to every bucket it covers
   (``sequence(floor(start/W), floor(end/W))`` — JVM-side, no UDF);
3. give each point its single bucket ``floor(ts/W)``;
4. equi-join on the bucket (one hash shuffle) and re-check the exact
   range predicate as a residual filter.

Cost at 100 TB: one shuffle of points + (intervals x avg buckets per
interval); W trades replication of the interval side against residual
selectivity. Skew follows interval density per bucket, which AQE's
skew-join split handles like any other hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts: str,
    start: str,
    end: str,
    bucket_s: int = 3600,
    extra_key: str | None = None,
) -> DataFrame:
    """Inner-join each ``points`` row to every ``intervals`` row with
    ``start <= ts < end`` (half-open), optionally also requiring
    equality on ``extra_key`` (present in both inputs, e.g. user_id —
    it joins the bucket key, cutting replication and skew).
    """
    te = F.unix_micros(F.col(ts).cast("timestamp"))
    se = F.unix_micros(F.col(start).cast("timestamp"))
    ee = F.unix_micros(F.col(end).cast("timestamp"))
    w = int(bucket_s) * 1_000_000

    p = points.withColumn("__bucket", F.floor(te / w))
    # end is exclusive: an interval ending exactly on a bucket boundary
    # does not cover that bucket
    i = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(F.floor(se / w), F.floor((ee - 1) / w))),
    )
    keys = ["__bucket"] + ([extra_key] if extra_key else [])
    return (
        p.join(i, keys)
        .filter((te >= se) & (te < ee))
        .drop("__bucket")
    )
