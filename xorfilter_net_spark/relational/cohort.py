"""Cohort retention analysis — group users by first-activity period,
then count how many of each cohort are still active k periods later
(the classic retention triangle).

Shape: periods are INTEGER epoch-period indexes (``floor(epoch_seconds /
period_seconds)`` — pure integer arithmetic, identical in any engine, no
calendar/timezone surface). The pipeline is three aggregates that all
key on the user column: (user, period) distinct activity (the only
corpus-sized shuffle — and it map-side combines, since a user's events
cluster in few periods), per-user min period (co-partitioned with the
first — AQE reuses the exchange), and the final (cohort, offset) count,
whose output is bounded by periods², not by users. The cohort join is
user-keyed on both sides of the same partitioning, so no second
corpus-sized exchange exists.

``floor`` commutes with ``min``, so the per-user cohort computed from
period indexes equals the period index of the user's first event —
the derivation order is immaterial.

No reference counterpart (beyond-reference analytics family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cohort_retention"]


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    period_seconds: int = 604800,
) -> DataFrame:
    """(cohort_period, period_offset, n_active) — distinct users of each
    first-activity cohort active again ``period_offset`` periods later.
    Row (c, 0, n) gives the cohort size; retention rate = n_active /
    cohort size, consumer-side (the repo's all-integer contract)."""
    if period_seconds <= 0:
        raise ValueError("period_seconds must be positive")
    activity = (
        events.select(
            F.col(user_col).alias("u"),
            F.floor(
                F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(period_seconds * 1_000_000)
            ).alias("period"),
        )
        .filter(F.col("u").isNotNull() & F.col("period").isNotNull())
        .dropDuplicates(["u", "period"])
    )
    cohort = activity.groupBy("u").agg(F.min("period").alias("cohort_period"))
    return (
        activity.join(cohort, "u")
        .groupBy(
            "cohort_period",
            (F.col("period") - F.col("cohort_period")).alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
