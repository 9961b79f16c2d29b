"""relational/{cohort,funnel,scd}.py + graph.bfs_distances: unit
semantics on hand-built fixtures, then registered-query oracle parity
(the driver's own comparison) for all four."""

from __future__ import annotations

import datetime as dt

import pytest

from xorfilter_net_spark.relational.cohort import cohort_retention
from xorfilter_net_spark.relational.funnel import funnel_counts
from xorfilter_net_spark.relational.graph import bfs_distances
from xorfilter_net_spark.relational.scd import scd2_history


def ts(day, sec=0):
    return dt.datetime(2024, 1, day, 0, 0, sec)


# ---------------------------------------------------------------- cohort
def test_cohort_retention_semantics(spark):
    week = 7 * 86400
    rows = [
        # u1: active week 0 and week 2 (relative to its own first week)
        (1, ts(1)), (1, ts(1, 30)), (1, ts(15)),
        # u2: first active week 1, again week 2
        (2, ts(8)), (2, ts(16)),
        # u3: single week
        (3, ts(2)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["cohort_period"], r["period_offset"]): r["n_active"]
        for r in cohort_retention(df, "user_id", "ts", week).collect()
    }
    base = 1704067200 // week  # 2024-01-01 falls in this epoch-week
    # u1,u3 cohort = base week; u2 cohort = base+1 (Jan 8)
    assert got[(base, 0)] == 2
    assert got[(base, 2)] == 1  # u1 back on Jan 15
    assert got[(base + 1, 0)] == 1
    assert got[(base + 1, 1)] == 1  # u2 back on Jan 16
    assert sum(v for (c, o), v in got.items() if o == 0) == 3


def test_cohort_validation(spark):
    df = spark.createDataFrame([(1, ts(1))], "user_id long, ts timestamp")
    with pytest.raises(ValueError):
        cohort_retention(df, "user_id", "ts", 0)


# ---------------------------------------------------------------- funnel
def test_funnel_strict_order(spark):
    rows = [
        (1, ts(1), "view"), (1, ts(2), "click"), (1, ts(3), "purchase"),
        # u2 clicks BEFORE viewing -> stops at step 1
        (2, ts(2), "view"), (2, ts(1), "click"),
        # u3 purchase before click -> reaches step 2 only
        (3, ts(1), "view"), (3, ts(3), "click"), (3, ts(2), "purchase"),
        # u4 never views
        (4, ts(1), "click"), (4, ts(2), "purchase"),
        # u5 simultaneous view+click -> strict > rejects the click
        (5, ts(1), "view"), (5, ts(1), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, et string")
    got = {
        r["step"]: r["n_users"]
        for r in funnel_counts(
            df, "user_id", "ts", "et", ["view", "click", "purchase"]
        ).collect()
    }
    assert got == {"view": 4, "click": 2, "purchase": 1}


def test_funnel_empty_steps_raises(spark):
    df = spark.createDataFrame([(1, ts(1), "a")], "u long, ts timestamp, et string")
    with pytest.raises(ValueError):
        funnel_counts(df, "u", "ts", "et", [])


# ------------------------------------------------------------------ scd2
def test_scd2_change_suppression_and_intervals(spark):
    rows = [
        (1, "a", ts(1), 10), (1, "a", ts(2), 11),  # suppressed repeat
        (1, "b", ts(3), 12), (1, "a", ts(4), 13),  # back to 'a' reopens
        (2, None, ts(1), 20), (2, None, ts(2), 21),  # NULL run collapses
        (2, "x", ts(3), 22),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, attr string, ts timestamp, event_id long"
    )
    out = scd2_history(df, "user_id", "attr", "ts", "event_id").collect()
    hist = {}
    for r in out:
        hist.setdefault(r["key"], []).append(
            (r["attr"], r["valid_from_us"], r["valid_to_us"], r["is_current"])
        )
    us = lambda d: int(ts(d).replace(tzinfo=dt.timezone.utc).timestamp()) * 10**6
    assert sorted(hist[1]) == sorted(
        [
            ("a", us(1), us(3), False),
            ("b", us(3), us(4), False),
            ("a", us(4), None, True),
        ]
    )
    assert sorted(hist[2], key=str) == sorted(
        [(None, us(1), us(3), False), ("x", us(3), None, True)], key=str
    )
    # intervals tile: each close equals the next open; exactly one open
    for vs in hist.values():
        ordered = sorted(vs, key=lambda v: v[1])
        assert [v[2] for v in ordered[:-1]] == [v[1] for v in ordered[1:]]
        assert [v[3] for v in ordered] == [False] * (len(ordered) - 1) + [True]


# ------------------------------------------------------------------- bfs
def test_bfs_path_graph(spark):
    # path 1-2-3-4-5 plus isolated-ish far chord 10-11
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "a long, b long"
    )
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, 6).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}  # 10,11 unreachable


def test_bfs_depth_cap_and_source(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "a long, b long"
    )
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, 2).collect()}
    assert got == {1: 0, 2: 1, 3: 2}
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, 6, source=3).collect()
    }
    assert got == {3: 0, 2: 1, 4: 1, 1: 2}


# ------------------------------------------------- oracle parity (driver)
@pytest.mark.parametrize(
    "name",
    [
        "q_cohort_retention",
        "q_funnel_view_click_purchase",
        "q_scd2_user_event_type",
        "q_bfs_copurchase",
    ],
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
    want = sorted(tuple(r) for r in con.execute(entrypoints.ORACLES[name]).fetchall())
    assert got == want
    assert len(got) > 0
