"""relational/graph.py: exact triangle counting — hand-computed graphs,
a brute-force differential on a random graph, co-occurrence edge
construction, and the per-group cap."""

from __future__ import annotations

from itertools import combinations

import pytest

from xorfilter_net_spark.relational.graph import (
    cooccurrence_edges,
    triangle_counts,
)


def brute_triangles(edges: set[tuple]) -> dict:
    """Per-node triangle counts by enumerating node triples."""
    nodes = {x for e in edges for x in e}
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri = {n: 0 for n in nodes}
    for x, y, z in combinations(sorted(nodes), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            tri[x] += 1
            tri[y] += 1
            tri[z] += 1
    return tri


def run(spark, edges: set[tuple]) -> dict:
    df = spark.createDataFrame(sorted(edges), "a long, b long")
    return {
        r["node"]: (r["deg"], r["wedge_pairs"], r["tri"])
        for r in triangle_counts(df).collect()
    }


def test_k4(spark):
    """K4: every node has deg 3 and sits in C(3,2)=3 triangles."""
    edges = {(a, b) for a, b in combinations(range(4), 2)}
    got = run(spark, edges)
    assert got == {n: (3, 3, 3) for n in range(4)}


def test_triangle_plus_pendant(spark):
    """A triangle {0,1,2} with a pendant 3-0: pendant closes nothing."""
    edges = {(0, 1), (0, 2), (1, 2), (0, 3)}
    got = run(spark, edges)
    assert got[0] == (3, 3, 1)
    assert got[1] == (2, 1, 1)
    assert got[2] == (2, 1, 1)
    assert got[3] == (1, 0, 0)


def test_triangle_free(spark):
    """C4 (square) has wedges but zero triangles."""
    edges = {(0, 1), (1, 2), (2, 3), (0, 3)}
    got = run(spark, edges)
    assert all(v[2] == 0 for v in got.values())
    assert all(v[0] == 2 and v[1] == 1 for v in got.values())


def test_random_graph_matches_bruteforce(spark):
    """Erdos-Renyi-ish deterministic graph vs triple enumeration —
    exercises the orientation tie-breaks on a skewed degree mix."""
    edges = set()
    x = 1234567
    for a in range(30):
        for b in range(a + 1, 30):
            x = (x * 6364136223846793005 + 1442695040888963407) % 2**64
            if x % 100 < 22:
                edges.add((a, b))
    # add a hub to force skew through the orientation path
    for b in range(1, 25):
        edges.add((0, b))
    got = run(spark, edges)
    want = brute_triangles(edges)
    assert {n: v[2] for n, v in got.items()} == want


def test_cooccurrence_edges_basic(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 11), (2, 12), (2, 12), (3, 99)],
        "g long, i long",
    )
    got = {
        (r["a"], r["b"])
        for r in cooccurrence_edges(df, "g", "i").collect()
    }
    assert got == {(10, 11), (10, 12), (11, 12)}


def test_cooccurrence_cap_bounds_pairs(spark):
    """Cap 3 ⇒ every group contributes at most C(3,2)=3 pairs, chosen
    deterministically (same result on re-run)."""
    rows = [(1, i) for i in range(10)] + [(2, i) for i in range(4)]
    df = spark.createDataFrame(rows, "g long, i long")
    e1 = sorted(
        (r["a"], r["b"])
        for r in cooccurrence_edges(
            df, "g", "i", max_items_per_group=3
        ).collect()
    )
    assert len(e1) <= 6
    e2 = sorted(
        (r["a"], r["b"])
        for r in cooccurrence_edges(
            df, "g", "i", max_items_per_group=3
        ).collect()
    )
    assert e1 == e2


def test_registered_query_matches_duckdb_oracle(spark, sf_tiny):
    """The driver-contract pair at sf0.001: Spark result == oracle."""
    import duckdb

    from xorfilter_net_spark import entrypoints

    got = {
        r["node"]: (r["deg"], r["wedge_pairs"], r["tri"])
        for r in entrypoints.QUERIES["q_triangle_copurchase"](
            spark, sf_tiny
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "create view lineitem as select * from "
        f"read_parquet('{sf_tiny}/lineitem.parquet')"
    )
    want = {
        node: (deg, wp, tri)
        for node, deg, wp, tri in con.execute(
            entrypoints.ORACLES["q_triangle_copurchase"]
        ).fetchall()
    }
    assert got == want


def test_triangle_xor_prune_parity(spark):
    import random

    from xorfilter_net_spark.relational.graph import triangle_counts

    rng = random.Random(42)
    edges = sorted(
        {tuple(sorted(rng.sample(range(40), 2))) for _ in range(160)}
    )
    df = spark.createDataFrame(edges, "a long, b long")
    plain = {
        tuple(r) for r in triangle_counts(df).collect()
    }
    pruned = {
        tuple(r) for r in triangle_counts(df, prune="xor").collect()
    }
    assert plain == pruned
    assert any(r[3] > 0 for r in plain)  # triangles exist
