"""Duplicate-cluster resolution: distributed connected components + canonical
survivor selection over near-duplicate pairs.

Completes the dedup pipeline (reference analogy: XORFilter.Net answers "seen
before?" per key — `BaseXorFilter.cs:98-108`; a training-data pipeline must
also answer "which copy do we KEEP?" when near-dup *pairs* chain into
clusters: A~B, B~C ⇒ {A,B,C} is one duplicate group even if A and C never
matched directly).

Algorithm: alternating **large-star / small-star** (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce and
Beyond", SoCC'14). Published bound: converges in O(log^2 n) rounds on ANY
graph — unlike naive min-label propagation, whose round count is the graph
*diameter* (adversarial dup chains of length k need k rounds). Each round is
one aggregation + one co-partitioned join on the node id, i.e. exactly the
shape Spark shuffles efficiently; no collect_list (a skewed star node would
OOM a grouped-list formulation — we only ever take min()).

Scale shape at 100 TB:
  - per round: groupBy(u).min(v)  (partial aggregation map-side)  +
    shuffle-hash join on u — both keyed identically, so AQE coalesces and
    the join reuses the aggregation's exchange where possible.
  - edge set SHRINKS monotonically toward one star edge per non-root node,
    so later rounds are cheap.
  - convergence test is an O(1)-row aggregate (count + order-insensitive
    xxhash64 checksum), not a subtract of two edge sets.
  - near-dup graphs in practice have tiny components (pairs/triples); the
    loop then exits after 2 rounds. The log^2 bound is the insurance
    against adversarial chains, not the common path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon_edges(pairs: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge set as canonical (a=min, b=max) rows, no self-loops."""
    a, b = F.col(src), F.col(dst)
    return (
        pairs.select(
            F.least(a, b).alias("a"),
            F.greatest(a, b).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )


def _symmetric(edges: DataFrame) -> DataFrame:
    return edges.selectExpr("a as u", "b as v").unionAll(
        edges.selectExpr("b as u", "a as v")
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, m) for every neighbor v > u, where m = min(N(u) ∪ {u})."""
    sym = _symmetric(edges)
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """(v, m) for every neighbor v ≤ u plus (u, m), m = min(N≤(u) ∪ {u})."""
    sym = _symmetric(edges)
    le = sym.filter(F.col("v") < F.col("u"))
    mins = le.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    children = le.join(mins, "u").select(
        F.col("v").alias("a"), F.col("m").alias("b")
    )
    selfrows = mins.select(F.col("u").alias("a"), F.col("m").alias("b"))
    return (
        children.unionAll(selfrows)
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )


def _signature(edges: DataFrame) -> tuple[int, int]:
    """(row count, order-insensitive checksum) — O(1)-row convergence probe."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) accumulator: ANSI-safe (sum of int64 hashes would
        # overflow long), order-insensitive by commutativity
        F.coalesce(
            F.sum(F.xxhash64(F.col("a"), F.col("b")).cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 50,
) -> DataFrame:
    """Component labels for every node appearing in ``pairs``.

    Returns (id, comp) where ``comp`` is the component's minimum node id
    (the natural canonical representative for min-id survivor policies).
    Roots label themselves. Deterministic: output depends only on the edge
    *set*, not on partitioning or input order.
    """
    # localCheckpoint per round truncates lineage: round R's plan must not
    # nest round R-1's (Catalyst would re-optimize a superlinearly growing
    # tree and the loop stalls on the driver long before data is the
    # bottleneck). On a real cluster swap in reliable .checkpoint() when
    # executor loss matters; results are identical.
    edges = _canon_edges(pairs, src, dst).localCheckpoint(eager=True)
    sig = _signature(edges)
    for _ in range(max_rounds):
        after_large = _large_star(edges)
        nxt = _small_star(after_large).localCheckpoint(eager=True)
        nxt_sig = _signature(nxt)
        edges = nxt
        if nxt_sig == sig:
            break
        sig = nxt_sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    # converged edge set is a star forest: (child, root) rows; roots appear
    # only on the b side. Every original node is either a child or a root.
    labels = (
        edges.selectExpr("a as id", "b as comp")
        .unionAll(edges.selectExpr("b as id", "b as comp"))
        .groupBy("id")
        .agg(F.min("comp").alias("comp"))
    )
    return labels


def assign_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Every doc labeled with its duplicate-cluster id (its own id when it
    has no near-duplicates). Adds column ``comp_id``."""
    labels = connected_components(pairs, src, dst)
    return (
        docs.join(labels, docs[id_col] == labels["id"], "left")
        .withColumn("comp_id", F.coalesce(F.col("comp"), F.col(id_col)))
        .drop("id", "comp")
    )


def near_dup_survivors(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Keep exactly one doc per duplicate cluster — the minimum id.

    Because ``connected_components`` labels with the cluster-min id, the
    survivor of a cluster is the doc whose id equals its own label; docs
    outside any pair survive trivially. One anti-join, no window."""
    labels = connected_components(pairs, src, dst)
    losers = labels.filter(F.col("id") != F.col("comp")).select("id")
    return docs.join(losers, docs[id_col] == losers["id"], "left_anti")
