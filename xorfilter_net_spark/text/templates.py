"""Template / boilerplate mining over transcripts (training-data op).

Chat corpora are full of canned text: greeting macros, tool-error
boilerplate, retry apologies, scripted system prompts. Left in, these
templates dominate the loss (the model memorizes them) and leak across
train/eval splits; the standard curation step is to MINE them first —
find normalized turn texts that recur across many *distinct
conversations* — then strip or downweight. This is the turn-level
complement of exact document dedup (`dedup/exact.py`): dedup asks "is
this document repeated", template mining asks "is this *line* the same
across thousands of different documents".

Normalization is deliberately cheap and fully relational: lowercase,
digit runs -> '#', whitespace runs -> single space, trim. That folds
"Attempt 3 failed" / "attempt  17 FAILED" into one template while
keeping genuinely distinct content apart.

Scale shape (the 100 TB plan): normalization is zero-shuffle codegen
over the scan; the ONE exchange is the (role, template) aggregate,
which map-side-combines to one row per distinct template per map task
before the wire. At extreme scale the shuffle key can carry
``xxhash64(template)`` instead of the raw string (the same swap
documented for repetition grams) — nothing else changes. The
``min_convs`` filter runs AFTER the aggregate, on the vocabulary-sized
result.

No reference counterpart (the reference has no text operators — opaque
byte keys, /root/reference/README.md:114); mandated training-pipeline
adjacency. Value-exact DuckDB oracle: the identical normalize +
aggregate program (template_oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the two dialects of the same normalization — kept adjacent so query
# and oracle can never drift (DuckDB needs the explicit 'g' flag;
# Spark's regexp_replace is global by default)
_NORM_SPARK = (
    "lower(trim(regexp_replace(regexp_replace({col}, '[0-9]+', '#'), "
    "'\\\\s+', ' ')))"
)
_NORM_DUCK = (
    "lower(trim(regexp_replace(regexp_replace({col}, '[0-9]+', '#', 'g'), "
    "'\\s+', ' ', 'g')))"
)


def mine_templates(
    turns: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    min_convs: int = 2,
) -> DataFrame:
    """(role, template, n_turns, n_convs) for every normalized turn
    text that appears in at least ``min_convs`` distinct conversations.
    Empty-after-normalization turns are excluded (they are the empty-
    turn lint defect, not boilerplate)."""
    if min_convs < 1:
        raise ValueError(f"min_convs must be >= 1, got {min_convs}")
    norm = F.expr(_NORM_SPARK.format(col=text_col))
    return (
        turns.select(
            F.col(conv_col).alias("conv_id"),
            F.col(role_col).alias("role"),
            norm.alias("template"),
        )
        .filter(F.col("template").isNotNull() & (F.col("template") != ""))
        .groupBy("role", "template")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.countDistinct("conv_id").cast("long").alias("n_convs"),
        )
        .filter(F.col("n_convs") >= min_convs)
    )


def template_oracle_sql(src: str = "transcripts", min_convs: int = 2) -> str:
    """DuckDB replay of the identical normalize + aggregate program,
    as a SELECT over ``src`` (caller prefixes transcript CTEs)."""
    norm = _NORM_DUCK.format(col="text")
    return f"""
    select role, template,
           cast(count(*) as bigint) as n_turns,
           cast(count(distinct conv_id) as bigint) as n_convs
    from (select conv_id, role, {norm} as template from {src})
    where template is not null and template <> ''
    group by role, template
    having count(distinct conv_id) >= {min_convs}
    """


def strip_templates(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    min_convs: int = 2,
) -> DataFrame:
    """The action half of template mining: REMOVE every turn whose
    normalized text is a cross-conversation template (>= ``min_convs``
    distinct conversations) and re-index the survivors per conversation
    (0..n-1 in original turn order) so downstream chat-template
    consumers still see contiguous indices.

    Scale shape: the mined template set is vocabulary-width, so it
    comes back as a BROADCAST anti-join against the map-side normalized
    turn stream — the corpus itself shuffles exactly once, for the
    re-index window on ``conv_col`` (and on a conv-bucketed table not
    at all). Returns (conv_id, turn_idx, role, text) survivors."""
    norm = F.expr(_NORM_SPARK.format(col=text_col))
    tpl = mine_templates(
        turns, conv_col, role_col, text_col, min_convs
    ).select("role", "template")
    flagged = turns.select(
        F.col(conv_col).alias("conv_id"),
        F.col(idx_col).alias("__idx"),
        F.col(role_col).alias("role"),
        F.col(text_col).alias("text"),
        norm.alias("template"),
    )
    from pyspark.sql.window import Window

    survivors = flagged.join(
        F.broadcast(tpl), ["role", "template"], "left_anti"
    )
    # (idx, role, text) tiebreak: rows that still tie are identical in
    # every output column, so the re-index is a pure function of the
    # data (the turn_merge determinism convention). The anti-join is
    # null-UNSAFE on both engines by design: a NULL-role or
    # NULL-template turn never matches a mined template and survives.
    w = (
        Window.partitionBy("conv_id")
        .orderBy(
            F.col("__idx").asc_nulls_first(),
            F.col("role").asc_nulls_first(),
            F.col("text").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        survivors.withColumn(
            "turn_idx", (F.count(F.lit(1)).over(w) - 1).cast("int")
        )
        .select("conv_id", "turn_idx", "role", "text")
    )


def strip_oracle_sql(src: str = "transcripts", min_convs: int = 2) -> str:
    """DuckDB replay of :func:`strip_templates` (same normalize, same
    anti-join, same deterministic re-index)."""
    norm = _NORM_DUCK.format(col="text")
    norm_s = _NORM_DUCK.format(col="s.text")
    return f"""
    select conv_id,
           cast(row_number() over (
               partition by conv_id
               order by turn_idx nulls first, role nulls first,
                        text nulls first
           ) - 1 as int) as turn_idx,
           role, text
    from (
        select s.conv_id, s.turn_idx, s.role, s.text,
               {norm_s} as template
        from {src} s) s
    where not exists (
        select 1 from (
            select role, template from (
                select conv_id, role, {norm} as template from {src})
            where template is not null and template <> ''
            group by role, template
            having count(distinct conv_id) >= {min_convs}) t
        where t.role = s.role and t.template = s.template)
    """
