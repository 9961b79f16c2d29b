"""Frequent-pair mining / association-rule statistics (market-basket
analysis, the distributed A-Priori/SON shape: Agrawal-Srikant VLDB'94;
Savasere-Omiecinski-Navathe VLDB'95).

The A-Priori downward-closure prune runs FIRST and relationally: a pair
can only reach ``min_support`` if both items do, so baskets are
semi-joined to the frequent-item set before any pairing — on Zipf-ish
catalogs this collapses the per-basket quadratic blowup to the frequent
subset (exactness preserved; pair support <= item support). Pair
counting is then one self-join on the basket key + one (a, b) count
aggregate; per-basket cost is quadratic in FREQUENT items per basket,
the irreducible core of exact pair mining. ``max_items_per_basket``
bounds pathological baskets deterministically (md5 content order, same
device as cooccurrence_edges) — a documented, reproducible cap, not a
sample.

All outputs are integer counts (supports + basket total); confidence
``supp_ab/supp_a`` and lift are consumer-side divisions, per the repo's
ulp-free contract.

No reference counterpart (beyond-reference analytics family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["frequent_pairs"]


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_items_per_basket: int | None = None,
) -> DataFrame:
    """(item_a, item_b, supp_ab, supp_a, supp_b, n_baskets) for every
    unordered item pair co-occurring in >= min_support baskets; item_a <
    item_b. Rule metrics (confidence, lift) are ratios of these counts."""
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    items = df.select(
        F.col(basket_col).alias("g"), F.col(item_col).alias("i")
    ).dropDuplicates(["g", "i"])
    if max_items_per_basket is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("g").orderBy(
            F.md5(F.concat_ws("\x1f", "g", "i")), F.col("i")
        )
        items = (
            items.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= max_items_per_basket)
            .drop("rn")
        )
    supp = items.groupBy("i").agg(F.count(F.lit(1)).alias("supp"))
    freq = supp.filter(F.col("supp") >= min_support)
    pruned = items.join(
        freq.select("i"), "i", "left_semi"
    )
    pairs = (
        pruned.alias("a")
        .join(pruned.alias("b"), "g")
        .filter(F.col("a.i") < F.col("b.i"))
        .groupBy(F.col("a.i").alias("item_a"), F.col("b.i").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("supp_ab"))
        .filter(F.col("supp_ab") >= min_support)
    )
    n_baskets = items.agg(
        F.countDistinct("g").alias("n_baskets")
    )
    sa = supp.select(F.col("i").alias("item_a"), F.col("supp").alias("supp_a"))
    sb = supp.select(F.col("i").alias("item_b"), F.col("supp").alias("supp_b"))
    return (
        pairs.join(sa, "item_a")
        .join(sb, "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a", "item_b", "supp_ab", "supp_a", "supp_b", "n_baskets"
        )
    )
