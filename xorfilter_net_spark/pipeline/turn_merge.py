"""Merge consecutive same-role turns — chat-data normalization.

Real transcript ingest frequently splits one logical message into
several consecutive turns of the same role (client retries, streamed
chunks, tool output pagination). Chat-template training formats
require strict role alternation, so the standard normalization is:
collapse each maximal run of consecutive same-role turns into ONE
turn whose text is the run's texts joined in order.

This is the classic gaps-and-islands program, fully relational:
a run id = ``turn_idx - dense-position-within-role-sequence`` is
constant exactly on maximal consecutive same-role runs; expressed
shuffle-free-ly as ``sum(role changed ? 1 : 0) over (order by
turn_idx)`` per conversation — one window pass — then one aggregate
per (conv, run).

Scale shape: ONE shuffle on ``conv_id``; the window's lag/cumsum state
is O(1) per group, the run aggregate's state is bounded by run length
(the texts being joined — the output row's own size), and both stages
share the conv_id exchange (Catalyst reuses it). The re-emitted
``turn_idx`` is the run's ordinal (0..n_runs-1), preserving order and
restoring strict alternation whenever the input roles cycle.

No reference counterpart (mandated training-pipeline adjacency);
value-exact DuckDB oracle replays the identical program.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_consecutive_turns(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """One row per maximal consecutive same-role run:
    (conv_id, turn_idx = run ordinal, role, text = joined run texts,
    n_merged = turns collapsed into this row)."""
    # (role, text) are DETERMINISTIC tiebreaks: on duplicate turn_idx
    # (malformed but reachable input) a turn_idx-only sort would make
    # lag(role) — and therefore the run ids — run-order-dependent, and
    # Spark's default RANGE cumsum frame would diverge from the
    # oracle's explicit ROWS frame on the tie group. With the full
    # (idx, role, text) key, rows that still tie are identical in every
    # column the program reads, so any order yields the same result;
    # the cumsum uses an explicit rowsBetween to match the oracle.
    order_cols = [
        F.col("__idx").asc_nulls_first(),
        F.col("role").asc_nulls_first(),
        F.col("__text").asc_nulls_first(),
    ]
    # null-SAFE boundary (eqNullSafe == the oracle's IS DISTINCT FROM):
    # a NULL-role turn starts its own run after a non-null role and
    # joins a preceding NULL-role run — with a bare !=, the NULL
    # comparison would null out and silently merge across real
    # boundaries, diverging from the oracle
    base = turns.select(
        F.col(conv_col).alias("conv_id"),
        F.col(idx_col).alias("__idx"),
        F.col(role_col).alias("role"),
        F.coalesce(F.col(text_col), F.lit("")).alias("__text"),
    )
    w = Window.partitionBy("conv_id").orderBy(*order_cols)
    changed = (~F.lag("role", 1).over(w).eqNullSafe(F.col("role"))).cast(
        "long"
    )
    runs = base.withColumn("__chg", changed).withColumn(
        "__run",
        F.sum("__chg").over(
            Window.partitionBy("conv_id")
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )
    return (
        runs.groupBy("conv_id", "__run")
        .agg(
            # role is constant within a run; min() keeps the aggregate
            # deterministic under any partial-merge order
            F.min("role").alias("role"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__idx", "__text"))
                    ),
                    lambda s: s["__text"],
                ),
                sep,
            ).alias("text"),
            F.count(F.lit(1)).cast("long").alias("n_merged"),
        )
        .select(
            "conv_id",
            F.col("__run").cast("int").alias("turn_idx"),
            "role",
            "text",
            "n_merged",
        )
    )


def merge_oracle_tail(src: str = "transcripts", sep: str = "\n") -> str:
    """DuckDB replay of the identical gaps-and-islands program (CTE
    tail — caller prefixes ``with <source CTEs>,``)."""
    sep_sql = "chr(10)" if sep == "\n" else f"'{sep}'"
    return f"""
    chg as (
        select conv_id, turn_idx, role, coalesce(text, '') as t,
               case when lag(role) over (
                   partition by conv_id
                   order by turn_idx nulls first, role nulls first,
                            t nulls first
               ) is distinct from role then 1 else 0 end as c
        from {src}),
    runs as (
        select conv_id, turn_idx, role, t,
               sum(c) over (partition by conv_id
                   order by turn_idx nulls first, role nulls first,
                            t nulls first
                   rows between unbounded preceding and current row
               ) - 1 as r
        from chg)
    select conv_id, cast(r as int) as turn_idx,
           min(role) as role,
           string_agg(t, {sep_sql}
               order by turn_idx nulls first, t) as text,
           cast(count(*) as bigint) as n_merged
    from runs group by conv_id, r
    """
