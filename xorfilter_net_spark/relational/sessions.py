"""Gap-based sessionization.

Absent in the reference (SURVEY.md §2.2 — no windowing of any kind);
standard in event pipelines: group a user's events into sessions that
close after ``gap`` of inactivity.

Spark-first: the batch implementation is the built-in
``F.session_window(ts, gap)`` group — Catalyst plans it as one shuffle
on the key plus a per-partition sort and a streaming-capable session
merge, entirely JVM-side (no UDF, no per-key materialization). The same
expression works under Structured Streaming with a watermark, so the
batch and streaming definitions of "session" are one piece of code.

Equivalent relational definition (what the DuckDB oracle runs): a
session starts at any event whose gap from the previous event of the
same key exceeds ``gap``; session id = running count of starts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap: str = "30 minutes",
    aggs: list[Column] | None = None,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Aggregate ``df`` into per-(key, session) rows.

    Returns one row per session with ``key``, ``session_start`` (the
    session's first event timestamp), ``n_events``, plus any extra
    ``aggs`` expressions.

    Works unchanged on a *streaming* DataFrame: pass ``watermark_delay``
    and the same session_window expression runs in the streaming state
    store — open sessions are kept as state, merged as late rows arrive
    (sessions can merge when a bridging event lands between two open
    ones), and evicted once the watermark passes their close. State is
    bounded by (open sessions x delay), not history.
    """
    aggs = aggs or []
    src = df
    if df.isStreaming and watermark_delay is not None:
        src = df.withWatermark(ts, watermark_delay)
    return (
        src.groupBy(key, F.session_window(ts, gap).alias("__w"))
        .agg(
            F.min(ts).alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            *aggs,
        )
        .drop("__w")
    )
