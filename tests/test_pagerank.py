"""relational/pagerank.py: exact-integer differential vs a pure-Python
replay, partitioning invariance, and mass accounting."""

from __future__ import annotations

import pytest

from xorfilter_net_spark.relational.pagerank import MASS_E12, pagerank, tool_edges

EDGES = [
    ("a", "b", 2),
    ("a", "c", 1),
    ("b", "c", 3),
    ("c", "a", 1),
    ("c", "d", 1),
    # d is dangling (no out-edges): its mass redistributes uniformly
]


def py_pagerank(edges, d_e6=850_000, iters=15):
    out_w: dict = {}
    nodes: set = set()
    for s, t, w in edges:
        out_w[s] = out_w.get(s, 0) + w
        nodes |= {s, t}
    n = len(nodes)
    base = ((10**6 - d_e6) * MASS_E12 // 10**6) // n
    rank = {v: MASS_E12 // n for v in nodes}
    for _ in range(iters):
        dang = sum(rank[v] for v in nodes if v not in out_w)
        dshare = (d_e6 * dang // 10**6) // n
        inc = {v: 0 for v in nodes}
        for s, t, w in edges:
            inc[t] += (d_e6 * (rank[s] * w // out_w[s])) // 10**6
        rank = {v: base + dshare + inc[v] for v in nodes}
    return rank


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src string, dst string, w long")


def test_matches_python_replay_exactly(spark, edges_df):
    got = {
        r["node"]: r["rank_e12"]
        for r in pagerank(edges_df, iters=10).collect()
    }
    assert got == py_pagerank(EDGES, iters=10)


def test_partitioning_invariant(spark, edges_df):
    a = {
        r["node"]: r["rank_e12"]
        for r in pagerank(edges_df.repartition(1), iters=6).collect()
    }
    b = {
        r["node"]: r["rank_e12"]
        for r in pagerank(edges_df.repartition(5), iters=6).collect()
    }
    assert a == b


def test_mass_conserved_within_floor_leak(spark, edges_df):
    ranks = pagerank(edges_df, iters=10).collect()
    total = sum(r["rank_e12"] for r in ranks)
    # floors only ever LOSE mass, and at most a few units per edge/node
    # per iteration
    assert MASS_E12 - 10**7 <= total <= MASS_E12


def test_sink_heavy_node_ranks_highest(spark, edges_df):
    got = {
        r["node"]: r["rank_e12"] for r in pagerank(edges_df, iters=15).collect()
    }
    # c receives from a (1/3) and b (all): most central
    assert got["c"] == max(got.values())


def test_tool_edges_shape(spark):
    turns = spark.createDataFrame(
        [
            ("c1", 0, None),
            ("c1", 1, "tool_a"),
            ("c1", 2, "tool_b"),
            ("c2", 0, "tool_a"),
            ("c2", 1, "tool_b"),
        ],
        "conv_id string, turn_idx int, tool string",
    )
    got = {
        (r["src"], r["dst"]): r["w"] for r in tool_edges(turns).collect()
    }
    assert got == {
        ("none", "tool_a"): 1,
        ("tool_a", "tool_b"): 2,
    }


def py_hits(edges, iters=8):
    nodes: set = set()
    for s, t, w in edges:
        nodes |= {s, t}
    n = len(nodes)
    hub = {v: MASS_E12 // n for v in nodes}
    auth = {v: MASS_E12 // n for v in nodes}

    def half(scores, forward):
        raw = {v: 0 for v in nodes}
        for s, t, w in edges:
            if forward:
                raw[t] += scores[s] * w
            else:
                raw[s] += scores[t] * w
        total = sum(raw.values())
        if total == 0:
            return {v: MASS_E12 // n for v in nodes}
        return {v: raw[v] * MASS_E12 // total for v in nodes}

    for _ in range(iters):
        auth = half(hub, True)
        hub = half(auth, False)
    return auth, hub


def test_hits_matches_python_replay_exactly(spark, edges_df):
    from xorfilter_net_spark.relational.pagerank import hits

    got = {
        r["node"]: (r["auth_e12"], r["hub_e12"])
        for r in hits(edges_df, iters=6).collect()
    }
    auth, hub = py_hits(EDGES, iters=6)
    assert got == {v: (auth[v], hub[v]) for v in auth}


def test_hits_partitioning_invariant(spark, edges_df):
    from xorfilter_net_spark.relational.pagerank import hits

    a = {
        tuple(r)
        for r in hits(edges_df.repartition(1), iters=4).collect()
    }
    b = {
        tuple(r)
        for r in hits(edges_df.repartition(5), iters=4).collect()
    }
    assert a == b


def test_hits_heavy_weights_no_int64_wrap(spark):
    """Regression for the r1 ADVICE finding: per-edge products that each
    fit int64 can still SUM past 2^63 on one dominant dst (5 hubs at
    ~1.67e11 initial score x w=5e7 -> per-edge ~8.3e18 < 2^63, dst sum
    ~4.2e19 > 2^63). The decimal(38,0) sum path must match the
    arbitrary-precision Python replay exactly; the old bigint sum
    silently wrapped negative here."""
    from xorfilter_net_spark.relational.pagerank import hits

    w = 50_000_000
    edges = [(f"h{i}", "a", w) for i in range(5)] + [("a", "h0", 1)]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {
        r["node"]: (r["auth_e12"], r["hub_e12"])
        for r in hits(df, iters=3).collect()
    }
    auth, hub = py_hits(edges, iters=3)
    assert got == {v: (auth[v], hub[v]) for v in auth}
    assert all(a >= 0 and h >= 0 for a, h in got.values())


def test_hits_semantics(spark, edges_df):
    from xorfilter_net_spark.relational.pagerank import hits

    out = {
        r["node"]: (r["auth_e12"], r["hub_e12"])
        for r in hits(edges_df, iters=8).collect()
    }
    # c receives weight-4 in-links from the two biggest hubs -> top authority
    assert max(out, key=lambda v: out[v][0]) == "c"
    # d has no out-edges -> zero hub score; a has no strong in-links
    assert out["d"][1] == 0
    # L1 mass ~1e12 up to floor leak (<= n units per half-step)
    assert abs(sum(v[0] for v in out.values()) - MASS_E12) <= 8 * len(out)
    assert abs(sum(v[1] for v in out.values()) - MASS_E12) <= 8 * len(out)
