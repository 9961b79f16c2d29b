"""Ordered-sequence funnel analysis — how many users complete step 1,
then step 2 strictly after it, then step 3, ... (the classic product-
analytics conversion funnel, e.g. view -> click -> purchase).

Shape: one conditional-min aggregate per step, cascaded — step i+1's
aggregate sees only events of its type joined to step i's completion
times and keeps the earliest strictly-later one. Every shuffle in the
cascade is keyed on the SAME user column, so after the first exchange
the per-step joins and aggregates are co-partitioned (AQE reuses the
partitioning; no corpus-sized reshuffle per step), and each step's state
is one timestamp per surviving user — monotonically shrinking. Nothing
per-user ever reaches the driver; the report is one row per step.

Timestamps are compared as integer epoch-microseconds (``unix_micros``)
— the repo's ulp-free cross-engine convention — and "after" is strict
(``>``), the standard funnel semantics (a simultaneous pair does not
complete two steps).

At 10^12-event scale the alternative single-pass shape (collect each
user's sorted event array and fold it) shuffles the raw event stream
once but carries whole-user state; the cascade shuffles only
(user, type-filtered ts) projections, prunes users at every step, and
pushes each step's type filter into the scan. For funnels of 2-4 steps
the cascade wins on both counts.

No reference counterpart (beyond-reference analytics family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_counts"]


def funnel_counts(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """(step_idx, step, n_users) — users whose event stream contains the
    step types in order, each strictly after the previous step's
    earliest completion (the standard greedy-earliest funnel, which
    maximizes completions)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = events.select(
        F.col(user_col).alias("u"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
        F.col(type_col).alias("typ"),
    ).filter(F.col("u").isNotNull() & F.col("t").isNotNull())

    reached: DataFrame | None = None
    counts = []
    for i, step in enumerate(steps):
        step_ev = ev.filter(F.col("typ") == step)
        if reached is None:
            reached = step_ev.groupBy("u").agg(F.min("t").alias("t_done"))
        else:
            reached = (
                step_ev.join(reached, "u")
                .filter(F.col("t") > F.col("t_done"))
                .groupBy("u")
                .agg(F.min("t").alias("t_done"))
            )
        counts.append(
            reached.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i + 1).alias("step_idx"),
                F.lit(step).alias("step"),
                "n_users",
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out
