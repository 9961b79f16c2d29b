"""Context-window budget truncation — transcript suffix selection.

SFT/chat fine-tuning feeds each conversation into a model with a fixed
context window; the standard policy is KEEP THE LONGEST SUFFIX of turns
whose total token count fits the budget (most-recent context wins,
oldest turns dropped). Expressed relationally: a reverse running sum of
per-turn token counts over ``(conv_id, turn_idx desc)`` and a filter on
``cum_tokens <= budget``.

Scale shape: ONE window shuffle on ``conv_id`` with an UNBOUNDED
PRECEDING running-sum frame — O(1) state per group (a single
accumulator, never a collected conversation), map-side token counting
in pure codegen (``size(filter(split(...)))``), and the budget filter
applied above the window where Catalyst must keep it (the frame needs
every turn). At 100 TB this is the same plan: one exchange on the
conversation key, no skew risk beyond conversation length itself.

Token counting is the whitespace tokenizer shared with
``text/analysis.py`` (portable to DuckDB as
``len(list_filter(string_split(text,' '), w -> w <> ''))``), so the
oracle replays the identical program. No reference counterpart
(mandated training-pipeline adjacency).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _tok_count(text_col: str):
    return F.size(
        F.filter(
            F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
            lambda w: w != "",
        )
    )


def truncate_to_context_budget(
    turns: DataFrame,
    budget_tokens: int,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = ("role",),
) -> DataFrame:
    """Keep, per conversation, the longest suffix of turns whose total
    whitespace-token count is <= ``budget_tokens``.

    Returns the kept turn rows with ``n_tokens`` (this turn) and
    ``cum_tokens`` (this turn + all later turns — the suffix total up
    to and including this turn). A single turn larger than the budget
    drops the whole suffix from that point back (matching the "most
    recent context first" packing rule).
    """
    w = (
        Window.partitionBy(conv_col)
        .orderBy(F.col(idx_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = turns.select(
        F.col(conv_col).alias("conv_id"),
        F.col(idx_col).alias("turn_idx"),
        *[F.col(c) for c in keep_cols],
        _tok_count(text_col).cast("long").alias("n_tokens"),
    )
    return (
        toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget_tokens)
    )


def budget_oracle_tail(budget_tokens: int, src: str = "transcripts") -> str:
    """DuckDB replay of the identical program (reverse running sum +
    budget filter) for the value-exact oracle. Returned as a CTE tail
    (caller prefixes ``with <source CTEs>,``)."""
    return f"""
    toks as (
        select conv_id, turn_idx, role,
               cast(len(list_filter(string_split(coalesce(text, ''), ' '),
                    w -> w <> '')) as bigint) as n_tokens
        from {src}),
    cum as (
        select conv_id, turn_idx, role, n_tokens,
               sum(n_tokens) over (
                   partition by conv_id order by turn_idx desc
                   rows between unbounded preceding and current row
               ) as cum_tokens
        from toks)
    select conv_id, turn_idx, role, n_tokens,
           cast(cum_tokens as bigint) as cum_tokens
    from cum where cum_tokens <= {budget_tokens}
    """
