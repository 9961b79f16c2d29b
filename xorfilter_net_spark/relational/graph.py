"""Distributed exact triangle counting over a co-occurrence graph —
the second graph-analytics operator next to PageRank (relational/
pagerank.py): co-purchase / co-usage structure ("parts bought together",
"tools used in the same conversation"), the clustering-coefficient
numerator for community detection, and a classic shuffle-explosion
stress test.

Scale design (the whole point of this operator):

- **Degree-ordered orientation** (Chiba-Nishizeki / Suri-Vassilvitskii
  "Counting Triangles and the Curse of the Last Reducer", WWW'11): every
  undirected edge {a, b} is directed from the endpoint with the smaller
  ``(degree, node)`` key to the larger. Out-degree of every node in the
  oriented graph is then O(sqrt(m)) regardless of how skewed the raw
  degree distribution is — the celebrity node with 10^7 neighbors emits
  ZERO wedges because every edge points INTO it. The wedge self-join
  (the quadratic stage) is therefore bounded by sum(out_deg^2) <= m^1.5
  instead of sum(deg^2), which is unbounded under skew.
- The ``(degree, node)`` total order is compared as a ``struct`` — pure
  codegen, no rank assignment, no global sort, no single-partition
  window.
- Three equi-join shuffles total (degree attach x2 folded into one
  shape, wedge self-join on the pivot node, wedge-closure semi-join on
  the (v, w) pair); every one keyed on node/edge keys, AQE handles any
  residual skew.
- Per-group pair generation (``cooccurrence_edges``) self-joins within
  the group key; an optional deterministic per-group item cap bounds the
  quadratic blowup of mega-groups (hash-ordered row_number, stable under
  partitioning).

All outputs are exact integers; triangle identity is orientation-free,
so the DuckDB oracle counts a<b<c node-ordered closed triples without
replicating the degree machinery.

No reference counterpart (mandated beyond-reference analytics operator);
the skew treatment is this library's standing discipline (cf.
relational/salted.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cooccurrence_edges",
    "triangle_counts",
    "bfs_distances",
    "kcore_subgraph",
]


def cooccurrence_edges(
    df: DataFrame,
    group_col: str,
    item_col: str,
    max_items_per_group: int | None = None,
) -> DataFrame:
    """Distinct undirected co-occurrence edges (a, b), a < b: two items
    are adjacent iff they appear under the same group key.

    ``max_items_per_group`` deterministically caps each group to its
    hash-smallest items (md5 content order — the repo's standard
    engine-portable sampling order, cf. relational/sampling.py) before
    pairing, bounding the per-group quadratic blowup at scale.
    """
    items = df.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("i")
    ).dropDuplicates(["g", "i"])
    if max_items_per_group is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("g").orderBy(
            F.md5(F.concat_ws("\x1f", "g", "i")), F.col("i")
        )
        items = (
            items.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= max_items_per_group)
            .drop("rn")
        )
    a = items.alias("l")
    b = items.alias("r")
    return (
        a.join(b, "g")
        .filter(F.col("l.i") < F.col("r.i"))
        .select(F.col("l.i").alias("a"), F.col("r.i").alias("b"))
        .dropDuplicates(["a", "b"])
    )


def triangle_counts(
    edges: DataFrame,
    prune: str | None = None,
    broadcast_max_edges: int = 8_000_000,
) -> DataFrame:
    """(node, deg, wedge_pairs, tri) per node of an undirected simple
    graph given as distinct (a, b) rows with a < b.

    ``tri`` = triangles incident to the node (exact); ``wedge_pairs`` =
    deg*(deg-1)/2, the local-clustering-coefficient denominator — both
    integers so the contract stays ulp-free (coefficient = tri /
    wedge_pairs, consumer-side, cf. the PMI/log conventions).

    ``prune='xor'`` probes every wedge against an XOR filter of the
    oriented edge set BEFORE the closure join (relational/
    filter_join.py): wedges outnumber edges by orders of magnitude
    (sum out_deg² vs m), so the closure shuffle drops from |wedges| to
    ~|triangles| + FPR·|wedges| rows; zero false negatives keeps the
    count exact (row-identical, tested).

    WHEN to prune (measured at sf0.1, 1.2M edges / 41M wedges,
    local[32]): with the default ``prune=None`` the closure side
    broadcasts and the semi-join filters wedges MAP-SIDE with zero
    shuffle — 8.0 s end to end; ``prune='xor'`` costs 73.6 s here
    because it pays filter construction + per-wedge string probes to
    avoid a shuffle AQE already avoids. The prune is the
    *beyond-broadcast* strategy: once the edge set outgrows the
    broadcast threshold the closure join must shuffle all wedges, and
    probing first cuts that shuffle by ~|wedges|/|triangles|.

    The broadcast hint is GATED on the measured edge count
    (``broadcast_max_edges``, default 8M ≈ a few hundred MB of closure
    rows): under the cap the hint is forced (AQE's runtime stats can
    arrive too late — measured 52 s unhinted vs 8 s hinted at sf0.1);
    over it the plain join keeps AQE's sort-merge fallback instead of
    forcing a driver/executor-OOM-sized broadcast. The count is one
    cheap job over the already-persisted edge list.
    """
    edges = edges.select("a", "b").persist()
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionByName(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # Orient every edge from the smaller (deg, node) key to the larger.
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("degb"))
    keyed = edges.join(da, "a").join(db, "b")
    lt = F.struct("dega", "a") < F.struct("degb", "b")
    # three consumers (both wedge sides + closure): persist so the
    # degree-attach joins run once
    e_or = keyed.select(
        F.when(lt, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lt, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lt, F.col("degb")).otherwise(F.col("dega")).alias("degv"),
    ).persist()
    # Wedges at pivot u: unordered out-neighbor pairs, ordered by the
    # SAME (deg, node) key so (v, w) matches the oriented closure edge.
    e1 = e_or.alias("e1")
    e2 = e_or.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.u") == F.col("e2.u"))
        & (
            F.struct(F.col("e1.degv"), F.col("e1.v"))
            < F.struct(F.col("e2.degv"), F.col("e2.v"))
        ),
    ).select(
        F.col("e1.u").alias("u"),
        F.col("e1.v").alias("v"),
        F.col("e2.v").alias("w"),
    )
    closure = e_or.select(F.col("u").alias("v"), F.col("v").alias("w"))
    if prune == "xor":
        from .filter_join import filter_pruned_join

        wk = wedges.withColumn("__vw", F.concat_ws(":", "v", "w"))
        ck = closure.withColumn(
            "__vw", F.concat_ws(":", "v", "w")
        ).select("__vw")
        tris = filter_pruned_join(
            wk, ck, "__vw", "__vw", how="left_semi", width=8
        ).drop("__vw")
    elif edges.count() <= broadcast_max_edges:
        # explicit broadcast hint (gated on |E|): without it AQE only
        # converts to a broadcast join when the closure side's runtime
        # stats happen to be materialized under the threshold —
        # measured 52 s (sort-merge of 41M wedges) vs 8 s (hinted) for
        # the identical query at sf0.1/local[32]
        tris = wedges.join(F.broadcast(closure), ["v", "w"], "left_semi")
    else:
        # beyond-broadcast-cap graphs: let AQE pick (sort-merge of the
        # wedges, skew-split as needed); prune='xor' is the strategy
        # that cuts this shuffle when it dominates
        tris = wedges.join(closure, ["v", "w"], "left_semi")
    # ONE evaluation of the (expensive) closure join: the three node
    # roles explode in codegen instead of a 3-way self-union, which
    # would re-run the join per branch
    per_node = (
        tris.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("tri"))
    )
    out = (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            "deg",
            F.expr("deg * (deg - 1) div 2").alias("wedge_pairs"),
            F.coalesce(F.col("tri"), F.lit(0)).alias("tri"),
        )
    )
    return out


def bfs_distances(
    edges: DataFrame, max_depth: int = 6, source=None
) -> DataFrame:
    """Exact BFS hop distances over an undirected simple graph given as
    distinct (a, b) rows — (node, dist) for every node within
    ``max_depth`` hops of ``source`` (default: the smallest node key, so
    the query is self-contained and sf-independent).

    Level-synchronous frontier expansion: each round is ONE
    frontier-adjacency hash join (shuffle bounded by the frontier's
    out-edges, not the graph) plus an anti-join against the visited set —
    the standard Pregel iteration expressed relationally. ``dist`` is
    ``localCheckpoint``-ed per round: it feeds both the anti-join and the
    final union, so un-truncated lineage would double per level (same
    device as relational/pagerank.py). The adjacency list is persisted
    once and never re-shuffled (pre-partitioned on src by the first
    join's exchange, reused every round under AQE).

    At 100 TB-scale graphs the per-round cost is O(frontier out-degree);
    the visited set stays distributed end to end — only the empty-check
    scalar crosses to the driver each round.

    No reference counterpart (beyond-reference graph-analytics family,
    alongside triangle_counts and pagerank).
    """
    und = edges.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(
        edges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    adj = und.persist()
    if source is None:
        source = adj.agg(F.min("src")).collect()[0][0]
    dist = (
        adj.select(F.col("src").alias("node"))
        .filter(F.col("node") == F.lit(source))
        .dropDuplicates(["node"])
        .withColumn("dist", F.lit(0))
        .localCheckpoint()
    )
    frontier = dist.select("node")
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(adj, frontier["node"] == adj["src"])
            .select(F.col("dst").alias("node"))
            .dropDuplicates(["node"])
            .join(dist.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(depth))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint()
        frontier = nxt.select("node")
    adj.unpersist()
    return dist


def kcore_subgraph(edges: DataFrame, k: int, max_rounds: int = 100) -> DataFrame:
    """(node, core_deg) — the maximal k-core: the largest subgraph in
    which every node keeps degree >= k; ``core_deg`` is the node's degree
    WITHIN the core. Empty when no k-core exists.

    Iterative peel, the graph twin of the XOR filter's hypergraph peel
    (BaseXorFilter.cs:150-200 peels degree-1 hyperedges; this peels
    degree-<k nodes): each round recomputes degrees (one edge-keyed
    aggregate), semi-joins the surviving-node set against both endpoint
    columns, and stops at the fixpoint. Rounds are bounded by the peel
    depth (O(n) worst case on a path, O(log n)-ish on real skewed
    graphs); each round's shuffles shrink with the surviving edge set,
    and ``localCheckpoint`` truncates lineage so plan depth stays O(1)
    per round. Only the per-round edge count crosses to the driver.

    Iterative-deletion semantics are not monotone, so no recursive-CTE
    oracle exists; the peel IS idempotent at its fixpoint, though, so a
    bounded unroll of >= convergence-depth rounds replays it exactly
    (the driver oracle, entrypoints._kcore_oracle). Exactness at
    arbitrary depth is pinned by the pure-Python peel differential in
    tests/test_graph.py (same convention as pagerank).

    No reference counterpart (beyond-reference graph-analytics family).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    e = (
        edges.select("a", "b")
        .dropDuplicates(["a", "b"])
        .localCheckpoint()
    )
    n_edges = e.count()
    for _ in range(max_rounds):
        if n_edges == 0:
            break
        deg = (
            e.select(F.col("a").alias("node"))
            .unionByName(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("node")
        ne = (
            e.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint()
        )
        n_next = ne.count()
        e = ne
        if n_next == n_edges:
            break
        n_edges = n_next
    return (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("core_deg"))
    )
