"""Conversation integrity lint — transcript validation before training.

A multi-turn transcript table is only usable as SFT input if each
conversation is *well-formed*: turn indices contiguous from 0,
timestamps non-decreasing in turn order, roles following the expected
cycle, no empty turns, tool fields present exactly on tool turns. Real
ingest pipelines violate all of these (clock skew, dropped turns,
re-ingested partial conversations), and a lint pass is the standard
first stage of transcript curation — the conversational analog of the
Deequ-style validation suite (pipeline/validate.py) but with
*sequence-aware* checks no per-row constraint can express.

Scale shape: ONE shuffle on ``conv_id``. The sequence checks
(timestamp monotonicity, index contiguity) use a single window pass
with a ``lag(1)`` frame — O(1) state per group, never a per-
conversation collect — and everything downstream is an associative
conditional aggregate, so the map-side partial does the heavy lifting
and only per-conversation rows cross the wire. At 100 TB the plan is
unchanged: the window and the aggregate share the same hash
partitioning on ``conv_id`` (Catalyst reuses the exchange), and state
is bounded by one row regardless of conversation length.

No reference counterpart (the reference validates nothing — opaque
byte keys, `BaseXorFilter.cs:21`); mandated training-pipeline
adjacency. Value-exact DuckDB oracle: identical window + aggregate
program over the same seeded-defect transcript derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def conversation_lint(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
    ts_col: str = "ts_epoch",
    role_cycle: tuple[str, ...] = ("user", "assistant", "tool"),
) -> DataFrame:
    """Per-conversation integrity report.

    Returns one row per conversation:
      n_turns            total turns
      idx_contiguous     turn_idx is exactly {0..n-1} (no gaps/dups)
      n_ts_violations    turns whose ts decreases vs the previous turn
      n_role_mismatch    turns whose role differs from the expected
                         cycle position (``role_cycle[idx % len]``)
      n_empty_turns      turns with null/empty text
      n_tool_dangling    tool set on a non-tool turn OR missing on a
                         tool-role turn
      is_clean           all of the above pass
    """
    conv, idx, role = F.col(conv_col), F.col(idx_col), F.col(role_col)
    # pmod, not %: Spark's % keeps the dividend's sign, so a corrupt
    # negative turn_idx would feed element_at index 0 (hard error) or a
    # negative index (silent from-the-end lookup) — the lint must FLAG
    # malformed data, never crash on it
    expected_role = F.element_at(
        F.array(*[F.lit(r) for r in role_cycle]),
        F.pmod(idx, len(role_cycle)).cast("int") + 1,
    )
    # Per-row flags are computed MAP-SIDE, before the conv_id exchange:
    # only the ts-monotonicity check needs the window, so the shuffle
    # carries (conv_id, turn_idx, ts, three byte-width flags) instead
    # of the full turn — at transcript scale that drops shuffle bytes
    # and the window's sort working set by the text width (~4x here),
    # which is exactly the term the N→4N profiling identified as the
    # LLC-bound cost (BASELINE.md "r04 transcript-hygiene operators").
    pre = turns.select(
        conv.alias("conv_id"),
        idx.alias("turn_idx"),
        F.col(ts_col).alias("__ts"),
        # a NULL turn_idx has no expected cycle position — it is a role
        # violation BY DEFINITION on both engines (without the explicit
        # guard Spark's element_at(NULL+1) yields a NULL expected role
        # while SQL's CASE NULL falls to the ELSE branch, and the two
        # contracts diverge on malformed data). NULL role IS a cycle
        # violation — eqNullSafe, not !=.
        F.when(idx.isNull(), F.lit(1))
        .otherwise((~role.eqNullSafe(expected_role)).cast("long"))
        .alias("role_viol"),
        (
            F.coalesce(F.col(text_col), F.lit("")) == ""
        ).cast("long").alias("empty_viol"),
        (
            (
                F.col(tool_col).isNotNull()
                & ~role.eqNullSafe(F.lit(role_cycle[-1]))
            )
            | (
                F.col(tool_col).isNull()
                & role.eqNullSafe(F.lit(role_cycle[-1]))
            )
        ).cast("long").alias("tool_viol"),
    )
    # ts is a DETERMINISTIC tiebreak: duplicate turn_idx is a defect
    # class the lint itself targets, and with a turn_idx-only sort
    # lag(ts) over the tie group would be run-order-dependent —
    # n_ts_violations could vary run-to-run and diverge from the
    # oracle. Ordering ties by ts (nulls first, matching the oracle's
    # explicit NULLS FIRST) makes every lag comparison a pure function
    # of the data: rows equal in (idx, ts) are interchangeable.
    w = Window.partitionBy("conv_id").orderBy(
        F.col("turn_idx").asc_nulls_first(), F.col("__ts").asc_nulls_first()
    )
    prev_ts = F.lag("__ts", 1).over(w)
    flagged = pre.select(
        "conv_id",
        "turn_idx",
        # null-safe: a NULL ts never flags (no evidence of regression)
        F.coalesce(
            (F.col("__ts") < prev_ts).cast("long"), F.lit(0)
        ).alias("ts_viol"),
        "role_viol",
        "empty_viol",
        "tool_viol",
    )
    rep = flagged.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        (
            (F.min("turn_idx") == 0)
            & (F.max("turn_idx") == F.count(F.lit(1)) - 1)
            & (F.countDistinct("turn_idx") == F.count(F.lit(1)))
        ).alias("idx_contiguous"),
        F.coalesce(F.sum("ts_viol"), F.lit(0)).cast("long").alias(
            "n_ts_violations"
        ),
        F.sum("role_viol").cast("long").alias("n_role_mismatch"),
        F.sum("empty_viol").cast("long").alias("n_empty_turns"),
        F.sum("tool_viol").cast("long").alias("n_tool_dangling"),
    )
    return rep.withColumn(
        "is_clean",
        F.col("idx_contiguous")
        & (F.col("n_ts_violations") == 0)
        & (F.col("n_role_mismatch") == 0)
        & (F.col("n_empty_turns") == 0)
        & (F.col("n_tool_dangling") == 0),
    )


def lint_oracle_tail(src: str = "transcripts") -> str:
    """The identical lint program as DuckDB SQL (window ``lag`` pass +
    conditional aggregate), kept beside the implementation so the query
    and its oracle share one definition. Returned as a CTE TAIL
    (``lagged as (...) select ...``) so callers can prefix it with
    ``with <transcript/mutation CTEs>,``. ``sum(...)`` is cast to
    BIGINT to match Spark's LongType (the r02 HUGEINT lesson)."""
    return f"""
    lagged as (
        select conv_id, turn_idx,
               case when ts_epoch < lag(ts_epoch) over (
                   partition by conv_id
                   order by turn_idx nulls first, ts_epoch nulls first
               ) then 1 else 0 end as ts_viol,
               case when turn_idx is null then 1
                    when role is distinct from (
                   case cast(((turn_idx % 3) + 3) % 3 as int)
                   when 0 then 'user' when 1 then 'assistant'
                   else 'tool' end) then 1 else 0 end as role_viol,
               case when coalesce(text, '') = '' then 1 else 0
                   end as empty_viol,
               case when (tool is not null and role is distinct from 'tool')
                     or (tool is null and role = 'tool')
                   then 1 else 0 end as tool_viol
        from {src})
    select conv_id, count(*) as n_turns,
           (min(turn_idx) = 0 and max(turn_idx) = count(*) - 1
            and count(distinct turn_idx) = count(*)) as idx_contiguous,
           cast(sum(ts_viol) as bigint) as n_ts_violations,
           cast(sum(role_viol) as bigint) as n_role_mismatch,
           cast(sum(empty_viol) as bigint) as n_empty_turns,
           cast(sum(tool_viol) as bigint) as n_tool_dangling,
           (min(turn_idx) = 0 and max(turn_idx) = count(*) - 1
            and count(distinct turn_idx) = count(*)
            and sum(ts_viol) = 0 and sum(role_viol) = 0
            and sum(empty_viol) = 0 and sum(tool_viol) = 0) as is_clean
    from lagged group by conv_id
    """
