"""Streaming transcript-pair emission: turn streams -> SFT pairs.

The streaming counterpart of ``pipeline/curate_transcripts.py``'s pair
stage: transcript turns arrive as an event-time stream; a conversation
is CLOSED when no turn arrives for ``gap`` (built-in ``session_window``
— the state store holds one open session per live conversation, merging
sessions when a bridging turn arrives across micro-batches); on close,
every assistant turn becomes a (context, target) training pair with the
previous ``context_turns`` turns as prompt context.

All per-conversation work happens AFTER the state store hands back the
closed conversation as one row: the turn structs are collected into the
session aggregate (state bounded by conversation length — same bound as
the batch digest aggregate), sorted by turn_idx, and the pair extraction
is a pure codegen array lambda (``transform``/``slice``/``filter``) —
identical semantics to the batch window-frame definition, so
**stream == batch is the correctness contract**: at gaps larger than any
intra-conversation spacing, the emitted pairs equal
``q_turn_context_windows`` row for row (driver oracle + pytest replay).

Scale notes: one stateful shuffle on conv_id; state per key is the open
conversation's turns (bounded by conversation length x watermark-delayed
stragglers, NOT corpus size — closed sessions are evicted on watermark).
The pair lambda runs on emission, once per closed conversation; no
Python anywhere. Batch fallback: the identical expression tree runs on a
batch DataFrame (session_window works in both engines' modes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["pairs_from_turns_expr", "stream_transcript_pairs"]


def pairs_from_turns_expr(context_turns: int = 3) -> Column:
    """array<struct<turn_idx,context,target>> from a sorted turn-struct
    array column ``st`` (fields turn_idx, role, text) — the codegen
    replay of the batch ROWS-frame definition (NULL context on a
    conversation-opening assistant turn, '' never occurs because
    role-cycled turn 0 is 'user')."""
    k = int(context_turns)
    return F.expr(
        "filter(transform(sequence(1, size(st)), i -> struct("
        "  element_at(st, i).turn_idx as turn_idx,"
        "  element_at(st, i).role as role,"
        f" case when i > 1 then array_join(transform("
        f"   slice(st, greatest(i - {k}, 1), i - greatest(i - {k}, 1)),"
        "    x -> concat_ws(': ', x.role, x.text)), chr(10)) end as context,"
        "  element_at(st, i).text as target)),"
        " p -> p.role = 'assistant')"
    )


def stream_transcript_pairs(
    turns: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str | None = "1 hour",
    context_turns: int = 3,
    explode: bool = True,
) -> DataFrame:
    """Streaming (or batch) turns -> per-conversation training pairs.

    ``turns`` needs (conv_id, turn_idx, role, text, ts). With
    ``explode=False`` the result keeps one row per closed conversation
    with a ``pairs`` array — required for complete-mode sinks, where a
    generator above the aggregate is not supported; the caller explodes
    after the sink. ``watermark_delay=None`` skips the watermark: rows
    older than the watermark are dropped at INGESTION regardless of
    output mode, so a complete-mode replay whose micro-batches are not
    event-time-ordered must either skip the watermark (state is the
    full replay — fine for bounded replays) or order its input files;
    append mode REQUIRES a watermark (it is what closes sessions)."""
    df = turns
    if df.isStreaming and watermark_delay is not None:
        df = df.withWatermark("ts", watermark_delay)
    st = F.array_sort(
        F.collect_list(
            F.struct("turn_idx", "role", F.coalesce("text", F.lit("")).alias("text"))
        )
    )
    conv = (
        df.groupBy("conv_id", F.session_window("ts", gap))
        .agg(st.alias("st"))
        .select(
            "conv_id",
            pairs_from_turns_expr(context_turns).alias("pairs"),
        )
    )
    if not explode:
        return conv
    return conv.select(
        "conv_id", F.explode("pairs").alias("p")
    ).select(
        "conv_id",
        F.col("p.turn_idx").alias("turn_idx"),
        F.col("p.context").alias("context"),
        F.col("p.target").alias("target"),
    )
