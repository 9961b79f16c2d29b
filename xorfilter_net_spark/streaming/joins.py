"""Watermarked stream-stream event-time joins.

The reference library has no join surface at all (it is a static
set-membership structure, reference BaseXorFilter.cs:21-108); a
transcript-ingest pipeline needs one constantly: "pair every click with
the views by the same user in the preceding hour", "attach the tool
result stream to the tool call stream". Spark's streaming engine
supports exactly this shape natively — equi-join keys plus a time-range
condition, with watermarks on BOTH sides so the join state store can
evict rows that can no longer match.

Scale notes (the reason this plan survives 1000 executors):

- Both streams shuffle once on the equi-join keys into the join state
  store — the same hash exchange a batch sort-merge join would use.
- State per side is bounded by ``watermark_delay`` + the time-range
  width x per-key arrival rate, NOT by stream history: a row whose
  event time falls behind ``other side's watermark - interval width``
  is provably unmatchable and is evicted. Without the time-range
  condition Spark would have to keep every row forever.
- The join itself is JVM-side (whole-stage codegen on the matching);
  no Python anywhere.

Batch DataFrames take the identical logical join (same condition,
no watermark), which is how tests and the driver-contract oracle pin
stream/batch parity row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["enrich_stream", "interval_join_stream"]


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes (user
    profile, document metadata, model-version lookup) to every streaming
    row.

    Scale notes:
    - **Stateless**: unlike stream-stream joins there is no join state
      store and no watermark requirement — each micro-batch joins
      against the dimension and forgets it. State cost is zero no matter
      how long the stream runs.
    - **Broadcast by default**: the dim ships to executors once per
      micro-batch plan; the stream side never shuffles. For a dim beyond
      broadcast size pass ``broadcast=False`` and Spark shuffles the
      micro-batch against the dim (still bounded per trigger).
    - **Slowly-changing dims for free**: the dim DataFrame is re-planned
      every micro-batch, so a dim backed by a table/files picks up
      updates between triggers without restarting the query.
    - ``how='left'`` (enrichment must not drop stream rows) and
      ``'inner'`` are supported by the engine for stream-static joins;
      right/full-outer would need the static side to emit unmatched rows
      and are rejected by Spark itself.

    Batch DataFrames take the identical join — tests pin parity."""
    d = F.broadcast(dim) if broadcast else dim
    return stream.join(d, on, how)


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    lower: str,
    upper: str,
    watermark_delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` and ``right`` on ``on`` where
    ``left.left_time + lower <= right.right_time <= left.left_time + upper``.

    ``lower``/``upper`` are SQL interval strings (e.g. ``"-24 hours"``,
    ``"0 seconds"``). Column names other than ``on``, ``left_time`` and
    ``right_time`` must not collide — pre-rename payload columns.

    Streaming inputs get ``withWatermark`` on their event-time column;
    the time-range condition then bounds join state on both sides.
    ``how`` may be ``inner`` or the streaming-supported outer variants
    (``left_outer``/``right_outer``/``full_outer`` — outer rows emit
    once the watermark proves no match can arrive).
    """
    lhs, rhs = left.alias("l"), right.alias("r")
    if lhs.isStreaming:
        lhs = lhs.withWatermark(left_time, watermark_delay)
    if rhs.isStreaming:
        rhs = rhs.withWatermark(right_time, watermark_delay)

    def iv(s: str) -> str:
        # "-24 hours" -> "- INTERVAL 24 hours", "30 minutes" -> "+ INTERVAL ..."
        s = s.strip()
        sign = "-" if s.startswith("-") else "+"
        return f"{sign} INTERVAL {s.lstrip('+-').strip()}"

    cond = F.expr(
        f"r.{right_time} >= l.{left_time} {iv(lower)} AND "
        f"r.{right_time} <= l.{left_time} {iv(upper)}"
    )
    for k in on:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))

    joined = lhs.join(rhs, cond, how)
    # collapse the duplicated equi-key columns (coalesce for outer rows)
    keep = [
        F.coalesce(F.col(f"l.{k}"), F.col(f"r.{k}")).alias(k) for k in on
    ]
    l_cols = [c for c in left.columns if c not in on]
    r_cols = [c for c in right.columns if c not in on]
    return joined.select(
        *keep,
        *[F.col(f"l.{c}") for c in l_cols],
        *[F.col(f"r.{c}") for c in r_cols],
    )
