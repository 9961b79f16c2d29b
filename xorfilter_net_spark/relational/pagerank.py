"""Distributed PageRank over a weighted edge list — the iterative graph
operator for corpus/agent-behavior analytics (here: which tools are
central in agent tool-call flows, via the transcript transition matrix;
generically: link graphs for crawl-frontier/quality scoring, the
original web-corpus use).

All rank arithmetic is **int64 micro-units (rank_e12, total mass 10^12)
with pinned floor-division rules**, so per-iteration sums are exact,
associative, and identical under any partitioning/merge order AND
single-machine replay (tests/test_pagerank.py re-runs the identical
integer recurrence in plain Python and requires equality) — the same
convention every float-adjacent operator in this repo uses to keep ulp
out of contracts. The deliberate trade: floor division leaks ≤1 unit of
mass per edge per iteration (≈10^-12 relative), which damping washes
out; determinism is worth infinitely more than the twelfth decimal.

Recurrence (Brin-Page damping d, expressed in e6 units)::

    contrib(u→v)  = d_e6 * ((rank_e12(u) * w(u,v)) div out_w(u)) div 10^6
    rank'(v)      = base + dangling_share + Σ contrib(u→v)
    base          = ((10^6 - d_e6) * 10^12 div 10^6) div N
    dangling_share= d_e6 * (Σ rank of out-edge-less nodes) div 10^6 div N

Spark shape per iteration: ranks are a NODE-sized table (broadcast-joined
onto the edge list when they fit — AQE decides), contributions shuffle
once on dst (map-side-combinable integer sum), and the dangling mass is
ONE scalar collect. Web-scale graphs: edges never move between
iterations (cached once, co-partitioned on src), only node-sized rank
rows and one scalar cross the wire — the standard Pregel-style cost.
Lineage is cut by materializing ranks each iteration (node-sized
persist), the same O(1)-plan-depth discipline as text/bpe.py's loop.

No reference counterpart (mandated beyond-reference analytics operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "hits", "tool_edges"]

MASS_E12 = 10**12


def tool_edges(turns: DataFrame) -> DataFrame:
    """(src, dst, w) tool-transition edges from a transcript turn table
    — the q_tool_transition_matrix statistic as a graph."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    tool = F.coalesce("tool", F.lit("none"))
    return (
        turns.select("conv_id", "turn_idx", tool.alias("src"))
        .withColumn("dst", F.lead("src").over(w))
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )


def pagerank(
    edges: DataFrame,
    damping_e6: int = 850_000,
    iters: int = 15,
) -> DataFrame:
    """(node, rank_e12) after ``iters`` exact-integer power iterations.

    ``edges`` carries (src, dst, w); self-loops and parallel edges are
    legal (parallel edges should be pre-aggregated for efficiency).
    """
    spark = edges.sparkSession
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    e = edges.join(out_w, "src").select("src", "dst", "w", "out_w").persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return spark.createDataFrame([], "node string, rank_e12 long")
    base = ((10**6 - damping_e6) * MASS_E12 // 10**6) // n

    ranks = nodes.withColumn("rank_e12", F.lit(MASS_E12 // n))
    has_out = out_w.select(F.col("src").alias("node"))
    for _ in range(iters):
        dangling = (
            ranks.join(has_out, "node", "left_anti")
            .agg(F.coalesce(F.sum("rank_e12"), F.lit(0)).alias("s"))
            .collect()[0]["s"]
        )
        dang_share = (damping_e6 * int(dangling) // 10**6) // n
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                # all-integer: products stay < 2^63 (rank<=10^12, w<=out_w)
                F.expr(
                    f"({damping_e6} * (rank_e12 * w div out_w)) div {10**6}"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_e12"))
        )
        # ranks feeds TWO consumers per iteration (dangling + contrib),
        # so the logical plan would DOUBLE per round; localCheckpoint
        # truncates lineage outright (persist alone does not — a 15-iter
        # loop OOMed in plan stringification before this). Node-sized.
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base + dang_share)
                    + F.coalesce(F.col("in_e12"), F.lit(0))
                ).cast("long").alias("rank_e12"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    nodes.unpersist()
    return ranks


def _l1_norm_e12(raw: DataFrame, col: str, total: int) -> DataFrame:
    """score_e12 = floor(raw * 10^12 / total), computed EXACTLY in
    decimal(38,0): (x*M - (x*M) % S) / S — subtracting the remainder
    first makes the decimal division an exact integer, so no engine
    rounding mode can touch it (raw*M <= ~10^30 << 10^38)."""
    m = MASS_E12
    expr = (
        f"cast(((cast({col} as decimal(38,0)) * {m}) - "
        f"((cast({col} as decimal(38,0)) * {m}) % {total})) / {total} "
        "as long)"
    )
    return raw.withColumn(col, F.expr(expr))


def hits(edges: DataFrame, iters: int = 15) -> DataFrame:
    """(node, auth_e12, hub_e12) — HITS hubs/authorities (Kleinberg,
    JACM'99) over a weighted edge list, in the same exact-int64
    convention as ``pagerank``: scores are L1-normalized to 10^12
    micro-units after every half-step with pinned floor semantics, so
    the whole run is bit-identical under any partitioning and to the
    pure-Python replay in tests/test_pagerank.py.

    Per iteration: one dst-keyed integer-sum shuffle (auth step), one
    src-keyed one (hub step), and two scalar collects (the L1 totals).
    Edges are cached once and never move; only node-sized score rows
    cross the wire; ``localCheckpoint`` keeps plan depth O(1).

    Overflow: per-edge products AND their dst-keyed sums run in
    decimal(38,0) end-to-end (a bare int64 sum could silently wrap on
    one dominant hub with several heavy out-edges even when every
    per-edge product is in range), so the envelope is the weighted-mass
    bound Σ(score·w) < 10^26 per half-step — effectively unbounded for
    real graphs; the normalization shares the same decimal path."""
    spark = edges.sparkSession
    e = edges.select("src", "dst", "w").persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return spark.createDataFrame(
            [], "node string, auth_e12 long, hub_e12 long"
        )
    hubs = nodes.withColumn("hub_e12", F.lit(MASS_E12 // n))
    auths = nodes.withColumn("auth_e12", F.lit(MASS_E12 // n))

    def half_step(scores: DataFrame, score_col: str, from_col: str,
                  to_col: str, out_col: str) -> DataFrame:
        raw = (
            e.join(scores, e[from_col] == scores["node"])
            .select(
                F.col(to_col).alias("node"),
                (
                    F.col(score_col).cast("decimal(38,0)") * F.col("w")
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias(out_col))
        )
        total = raw.agg(
            F.coalesce(F.sum(out_col), F.lit(0)).alias("s")
        ).collect()[0]["s"]
        if total == 0:
            return nodes.withColumn(out_col, F.lit(MASS_E12 // n))
        normed = _l1_norm_e12(raw, out_col, int(total))
        return (
            nodes.join(normed, "node", "left")
            .select(
                "node",
                F.coalesce(F.col(out_col), F.lit(0)).alias(out_col),
            )
            .localCheckpoint(eager=True)
        )

    for _ in range(iters):
        auths = half_step(hubs, "hub_e12", "src", "dst", "auth_e12")
        hubs = half_step(auths, "auth_e12", "dst", "src", "hub_e12")
    out = nodes.join(auths, "node", "left").join(hubs, "node", "left").select(
        "node",
        F.coalesce("auth_e12", F.lit(0)).alias("auth_e12"),
        F.coalesce("hub_e12", F.lit(0)).alias("hub_e12"),
    )
    out = out.localCheckpoint(eager=True)
    e.unpersist()
    nodes.unpersist()
    return out
