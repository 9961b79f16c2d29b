"""Transcript curation capstone: conversations -> supervised pairs.

The transcript-side counterpart of ``pipeline/curate.py``: one lazy
plan that takes the raw turn table to training-ready (context, target)
pairs —

1. **conversation dedup**: a conversation's identity is the md5 of its
   turn texts in turn order; only the min-conv_id survivor of each
   digest group survives (same convention as dedup/exact.py);
2. **quality gate**: per-conversation profile thresholds (min turns,
   at least one assistant turn, min total chars) computed in the SAME
   aggregate that produced the digest — one pass over the turns;
3. **pair emission**: every assistant turn of a surviving conversation
   becomes a training pair — previous <=3 turns as 'role: text' context
   (bounded ROWS window frame, O(1) state) and the assistant text as
   target;
4. **deterministic split**: content-keyed md5 split on conv_id
   (relational/sampling.py semantics) — a conversation keeps its split
   when the corpus grows, and context never straddles splits because
   the split key is the conversation.

Scale notes: both corpus-sized exchanges key on ``conv_id`` (the
digest+profile aggregate and the pair window); the survivor-digest
window shuffles only conversation-count rows (tiny vs the turn table)
and the survivors list re-enters the turn table as a join on conv_id
(broadcast at test scale; hash-co-partitioned with the window exchange
at cluster scale). Per-group state is bounded by conversation length
(digest agg) or by the 3-row frame (window); zero Python nodes, no
range partitioning, nothing collected to the driver.

Sizing note (profiled at 23M docs — BASELINE.md "curate_transcripts
... profiled to root cause"): when the turn table is DERIVED by a
row-amplifying transform (here an explode, ~4.5×), each scan split's
shuffle-sort working set is amplified before the first exchange;
size ``spark.sql.files.maxPartitionBytes`` down (or repartition once
after derivation) so a task's sort state fits its execution-memory
share, or the map side external-sorts (7.6 GB spill, +50% CPU in the
profiled run). On a production 10^12-turn table, bucket by conv_id —
both corpus-wide exchanges then vanish entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["curate_transcript_pairs"]


def curate_transcript_pairs(
    turns: DataFrame,
    min_turns: int = 3,
    min_total_chars: int = 40,
    context_turns: int = 3,
    val_fraction: float = 0.1,
) -> DataFrame:
    """(conv_id, turn_idx, context, target, split) training pairs.

    ``turns`` must carry (conv_id, turn_idx, role, text); texts may be
    empty but not NULL-bearing conversations are assumed (NULL text is
    coalesced to '').
    """
    from ..relational.sampling import _bucket, _threshold_hex

    text = F.coalesce("text", F.lit(""))
    # one pass: conversation digest + quality profile
    conv = turns.groupBy("conv_id").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("turn_idx", text.alias("t")))
                    ),
                    lambda s: s["t"],
                ),
                "\x1f",
            )
        ).alias("digest"),
        F.count(F.lit(1)).alias("n_turns"),
        F.sum((F.col("role") == "assistant").cast("long")).alias("n_assistant"),
        F.sum(F.length(text)).cast("long").alias("total_chars"),
    )
    survivors = (
        conv.withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy("digest").orderBy("conv_id")
            ),
        )
        .filter(
            (F.col("__rk") == 1)
            & (F.col("n_turns") >= min_turns)
            & (F.col("n_assistant") >= 1)
            & (F.col("total_chars") >= min_total_chars)
        )
        .select("conv_id")
    )
    kept = turns.join(survivors, "conv_id")
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-context_turns, -1)
    )
    line = F.concat_ws(": ", "role", text)
    ctx_arr = F.collect_list(line).over(w)
    pairs = (
        kept.withColumn(
            "context",
            F.when(F.size(ctx_arr) > 0, F.array_join(ctx_arr, "\n")),
        )
        .filter(F.col("role") == "assistant")
        .select(
            "conv_id", "turn_idx", "context", text.alias("target")
        )
    )
    is_val = _bucket(["conv_id"]) < F.lit(_threshold_hex(val_fraction))
    return pairs.withColumn(
        "split", F.when(is_val, "val").otherwise("train")
    )
