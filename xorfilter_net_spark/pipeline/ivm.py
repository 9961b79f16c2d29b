"""Incremental view maintenance (IVM) for distributive aggregate views —
keep ``SELECT groups, count(*), sum(cols) GROUP BY groups`` current
under a change feed WITHOUT re-aggregating the base table (the classic
delta-propagation result: Gupta-Mumick-Subrahmanian SIGMOD'93; the shape
Materialize/Delta Live Tables productize).

Counts and sums are self-maintainable under insert/delete/update given
row pre-images: each change row contributes a signed delta
(+1 for insert/update_postimage, -1 for delete/update_preimage), deltas
aggregate to one row per touched group, and the view merges via a
null-safe full-outer join. Maintenance cost is O(delta) + O(touched
groups) — the base table is never read, which at a 10^12-row base and a
10^6-row delta is the difference between a job and a no-op. Groups whose
maintained count reaches zero vanish (exactly as recomputation would
drop them).

Pairs with ``sources/timetravel.py::table_changes(images='pre_post')``:
the versioned table's CDF emits precisely the Delta-CDF image rows this
consumes, so a materialized aggregate over a versioned table stays
current by reading only owner-changed buckets end to end.

Sum columns should be integers (the repo's ulp-free contract — float
retraction accumulates rounding drift precisely because IVM never
recomputes; integers make maintenance EXACTLY equal to recomputation,
which is what the oracle checks).

No reference counterpart (beyond-reference warehouse family).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["agg_view", "apply_changes"]


def agg_view(
    df: DataFrame, group_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    """The maintained view's definition: (groups..., n, sum_<c>...)."""
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(c).alias(f"sum_{c}") for c in sum_cols
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def apply_changes(
    view: DataFrame,
    changes: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Merge a pre/post-image change feed into ``view`` (as produced by
    ``agg_view``). Returns the maintained view — exactly equal to
    ``agg_view`` recomputed over the changed base."""
    sign = (
        F.when(
            F.col("change_type").isin("insert", "update_postimage"), F.lit(1)
        )
        .when(
            F.col("change_type").isin("delete", "update_preimage"), F.lit(-1)
        )
        # __s feeds the delta aggregate, so this branch cannot be pruned:
        # a feed with 'post'-image updates (irretractable) fails loudly
        # instead of silently corrupting the view
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("ivm: unknown change_type "), F.col("change_type")
                )
            ).cast("int")
        )
    )
    delta = (
        changes.withColumn("__s", sign)
        .groupBy(*group_cols)
        .agg(
            F.sum("__s").alias("__dn"),
            *[
                F.sum(F.col("__s") * F.col(c)).alias(f"__d_{c}")
                for c in sum_cols
            ],
        )
    )
    v = view.alias("v")
    d = delta.alias("d")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"v.{g}").eqNullSafe(F.col(f"d.{g}")) for g in group_cols],
    )
    merged = v.join(d, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"v.{g}"), F.col(f"d.{g}")).alias(g)
            for g in group_cols
        ],
        (
            F.coalesce(F.col("v.n"), F.lit(0))
            + F.coalesce(F.col("d.__dn"), F.lit(0))
        ).alias("n"),
        *[
            (
                F.coalesce(F.col(f"v.sum_{c}"), F.lit(0))
                + F.coalesce(F.col(f"d.__d_{c}"), F.lit(0))
            ).alias(f"sum_{c}")
            for c in sum_cols
        ],
    )
    return merged.filter(F.col("n") > 0)
