"""pipeline/profile.py, relational/assoc.py, graph.kcore_subgraph:
unit semantics, one-scan plan claim, Python peel differential, and
registered-query oracle parity."""

from __future__ import annotations

import random
from collections import defaultdict

import pytest

from xorfilter_net_spark.pipeline.profile import profile_columns
from xorfilter_net_spark.relational.assoc import frequent_pairs
from xorfilter_net_spark.relational.graph import kcore_subgraph


# --------------------------------------------------------------- profile
@pytest.fixture(scope="module")
def toy(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", -5.0),
            (3, None, 50.0),
            (3, "b", None),
        ],
        "id long, tag string, v double",
    )


def test_profile_values(spark, toy):
    got = {r["col_name"]: r for r in profile_columns(toy).collect()}
    r = got["id"]
    assert (r["n_rows"], r["n_nulls"], r["ndv"]) == (4, 0, 3)
    assert (r["min_num"], r["max_num"]) == (1.0, 3.0)
    assert r["min_str"] is None and r["max_str"] is None
    r = got["tag"]
    assert (r["n_rows"], r["n_nulls"], r["ndv"]) == (4, 1, 2)
    assert (r["min_str"], r["max_str"]) == ("a", "b")
    assert r["min_num"] is None
    r = got["v"]
    assert (r["n_nulls"], r["ndv"], r["min_num"], r["max_num"]) == (
        1, 3, -5.0, 50.0,
    )
    assert all(r["ndv_hll_ok"] for r in got.values())


def test_profile_no_exact_ndv(spark, toy):
    got = {r["col_name"]: r for r in profile_columns(toy, exact_ndv=False).collect()}
    assert all(r["ndv"] is None and r["ndv_hll_ok"] is None for r in got.values())
    assert all(r["ndv_hll"] is not None for r in got.values())


def test_profile_unknown_column(spark, toy):
    with pytest.raises(ValueError):
        profile_columns(toy, ["nope"])


def test_profile_single_scan(spark, sf_tiny):
    from xorfilter_net_spark.sources.session import load_table

    ev = load_table(spark, sf_tiny, "events")
    plan = (
        profile_columns(ev, ["event_id", "user_id", "event_type"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1, plan


# ----------------------------------------------------------------- assoc
def test_frequent_pairs_semantics(spark):
    baskets = [
        (1, ["x", "y", "z"]),
        (2, ["x", "y"]),
        (3, ["x", "y"]),
        (4, ["x", "z"]),
        (5, ["q"]),
        (6, ["x", "x", "y"]),  # duplicate item in basket counts once
    ]
    rows = [(g, i) for g, items in baskets for i in items]
    df = spark.createDataFrame(rows, "g long, i string")
    got = {
        (r["item_a"], r["item_b"]): (
            r["supp_ab"], r["supp_a"], r["supp_b"], r["n_baskets"]
        )
        for r in frequent_pairs(df, "g", "i", min_support=2).collect()
    }
    assert got == {
        ("x", "y"): (4, 5, 4, 6),
        ("x", "z"): (2, 5, 2, 6),
    }  # (y,z) co-occurs once -> below min_support


def test_frequent_pairs_validation(spark):
    df = spark.createDataFrame([(1, "a")], "g long, i string")
    with pytest.raises(ValueError):
        frequent_pairs(df, "g", "i", min_support=0)


# ----------------------------------------------------------------- kcore
def python_kcore(edges, k):
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
                changed = True
    return {n: len(nb) for n, nb in adj.items() if nb}


@pytest.mark.parametrize("k", [2, 3, 4])
def test_kcore_differential_random(spark, k):
    rng = random.Random(99 + k)
    edges = sorted(
        {
            tuple(sorted(rng.sample(range(30), 2)))
            for _ in range(70)
        }
    )
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["core_deg"] for r in kcore_subgraph(df, k).collect()}
    assert got == python_kcore(edges, k)


def test_kcore_cascade(spark):
    # path 1-2-3-4 attached to triangle 4-5-6: 2-core = the triangle,
    # reached only after the path peels AWAY node by node (cascade)
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (4, 6), (5, 6)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["core_deg"] for r in kcore_subgraph(df, 2).collect()}
    assert got == {4: 2, 5: 2, 6: 2}


def test_kcore_empty_and_validation(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    assert kcore_subgraph(df, 5).count() == 0
    with pytest.raises(ValueError):
        kcore_subgraph(df, 0)


# ------------------------------------------------- oracle parity (driver)
@pytest.mark.parametrize(
    "name", ["q_profile_events", "q_assoc_rules_copurchase"]
)
def test_registered_queries_match_duckdb(spark, sf_tiny, name):
    import duckdb

    from xorfilter_net_spark import entrypoints

    got = sorted(
        tuple(r) for r in entrypoints.QUERIES[name](spark, sf_tiny).collect()
    )
    con = duckdb.connect()
    for t in ("events", "lineitem"):
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{sf_tiny}/{t}.parquet')"
        )
    want = sorted(
        tuple(r) for r in con.execute(entrypoints.ORACLES[name]).fetchall()
    )
    assert got == want
    assert len(got) > 0


def test_kcore_registered_query_nonvacuous(spark, sf_tiny):
    from xorfilter_net_spark import entrypoints

    got = {
        r["node"]: r["core_deg"]
        for r in entrypoints.QUERIES["q_kcore_copurchase"](
            spark, sf_tiny
        ).collect()
    }
    # sf0.001: 200 parts, 60-core keeps 196 (python replay ground truth)
    assert len(got) == 196
    assert all(d >= 60 for d in got.values())
