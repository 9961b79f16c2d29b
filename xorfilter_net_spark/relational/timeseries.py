"""Time-series resampling operators — fixed-interval OHLC downsampling
and calendar gap-filling with forward fill (LOCF), the two workhorses of
event-stream -> regular-grid conversion (metrics pipelines, feature
stores, financial bars).

Buckets are INTEGER epoch-interval indexes (``floor(epoch_us /
interval_us)``) — pure integer arithmetic, no calendar/timezone surface,
identical in any engine (the repo's standing convention, cf.
relational/cohort.py).

``resample_ohlc``: one hash aggregate — open/close are ``min_by`` /
``max_by`` over a (epoch_us, tiebreak) struct key (total order, so
ties are deterministic), high/low/count ride in the same pass. All
selection, no arithmetic: doubles pass through bit-identically. The
registered query's oracle computes open/close via row_number windows
instead — two different machineries agreeing value-for-value.

``gapfill_forward``: per-key daily counts densified onto the full
[first-active-day, global-last-day] grid (``explode(sequence(...))`` —
rows-per-key bounded by the calendar length, not the event count) and
forward-filled with ``last(ignorenulls)`` over a cumulative ROWS frame
(O(1) window state). The only corpus-sized shuffle is the initial daily
aggregate (map-side combined); the grid join is key-co-partitioned with
it.

No reference counterpart (beyond-reference analytics family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["resample_ohlc", "gapfill_forward"]


def _epoch_us(ts_col: str):
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def resample_ohlc(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    interval_seconds: int = 21600,
) -> DataFrame:
    """(key, bucket, open, high, low, close, n) per (key, fixed
    interval); open/close = value at the earliest/latest (ts, tiebreak)
    within the bucket. NULL values/timestamps are excluded (a bar needs
    a price)."""
    if interval_seconds <= 0:
        raise ValueError("interval_seconds must be positive")
    e = events.select(
        F.col(key_col).alias("key"),
        _epoch_us(ts_col).alias("t"),
        F.col(value_col).alias("v"),
        F.col(tiebreak_col).alias("tb"),
    ).filter(F.col("v").isNotNull() & F.col("t").isNotNull())
    ord_key = F.struct("t", "tb")
    return (
        e.groupBy(
            "key",
            F.floor(
                F.col("t") / F.lit(interval_seconds * 1_000_000)
            ).alias("bucket"),
        )
        .agg(
            F.min_by("v", ord_key).alias("open"),
            F.max("v").alias("high"),
            F.min("v").alias("low"),
            F.max_by("v", ord_key).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def gapfill_forward(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    period_seconds: int = 86400,
) -> DataFrame:
    """(key, period, n_filled) — per-key event counts on the dense
    period grid from the key's first active period to the CORPUS's last,
    missing periods carrying the last observed count forward (LOCF).
    The first period of every key has data by construction, so no
    leading NULLs survive."""
    if period_seconds <= 0:
        raise ValueError("period_seconds must be positive")
    e = events.select(
        F.col(key_col).alias("key"),
        F.floor(
            _epoch_us(ts_col) / F.lit(period_seconds * 1_000_000)
        ).alias("period"),
    ).filter(F.col("key").isNotNull() & F.col("period").isNotNull())
    daily = e.groupBy("key", "period").agg(F.count(F.lit(1)).alias("n"))
    span = daily.groupBy("key").agg(F.min("period").alias("p0"))
    gmax = daily.agg(F.max("period").alias("p1"))
    cal = (
        span.crossJoin(F.broadcast(gmax))
        .select("key", F.explode(F.sequence("p0", "p1")).alias("period"))
    )
    w = (
        Window.partitionBy("key")
        .orderBy("period")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cal.join(daily, ["key", "period"], "left")
        .select(
            "key",
            "period",
            F.last("n", ignorenulls=True).over(w).alias("n_filled"),
        )
    )
