"""sketches/rolling.py: trailing-window semantics vs a Python replay
(gaps, partial leading windows), genericity over sketches, and
registered-query oracle parity."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from xorfilter_net_spark.sketches.rolling import rolling_distinct_exact


def test_rolling_vs_python_replay(spark):
    rng = random.Random(5)
    rows = []
    for _ in range(400):
        day = rng.randrange(0, 20)
        # leave days 7-9 empty (gap): they must NOT appear as anchors
        if day in (7, 8, 9):
            continue
        u = rng.randrange(0, 40)
        rows.append((u, dt.datetime(2024, 1, 1) + dt.timedelta(days=day, seconds=u)))
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    got = {
        r["period"]: r["n_rolling"]
        for r in rolling_distinct_exact(df, "u", "ts", 1000, window=3).collect()
    }
    base = 1704067200 // 86400
    by_day = {}
    for u, t in rows:
        d = base + (t - dt.datetime(2024, 1, 1)).days
        by_day.setdefault(d, set()).add(u)
    want = {
        d: len(set().union(*(by_day.get(d - k, set()) for k in range(3))))
        for d in by_day
    }
    assert got == want
    assert base + 7 not in got  # gap days are not anchors


def test_window_one_is_daily_distinct(spark):
    rows = [(1, dt.datetime(2024, 1, 1)), (2, dt.datetime(2024, 1, 1)),
            (1, dt.datetime(2024, 1, 2))]
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    got = {
        r["period"]: r["n_rolling"]
        for r in rolling_distinct_exact(df, "u", "ts", 100, window=1).collect()
    }
    base = 1704067200 // 86400
    assert got == {base: 2, base + 1: 1}


def test_validation(spark):
    df = spark.createDataFrame([(1, dt.datetime(2024, 1, 1))], "u long, ts timestamp")
    with pytest.raises(ValueError):
        rolling_distinct_exact(df, "u", "ts", 100, window=0)
    with pytest.raises(ValueError):
        rolling_distinct_exact(df, "u", "ts", 100, period_seconds=0)


def test_registered_query_matches_duckdb(spark, sf_tiny):
    import duckdb

    from xorfilter_net_spark import entrypoints

    got = sorted(
        tuple(r)
        for r in entrypoints.QUERIES["rolling_distinct_users"](
            spark, sf_tiny
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "create view events as select * from "
        f"read_parquet('{sf_tiny}/events.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            entrypoints.ORACLES["rolling_distinct_users"]
        ).fetchall()
    )
    assert got == want
    assert len(got) > 5


def test_rolling_topk_vs_python_replay(spark):
    from xorfilter_net_spark.sketches.rolling import rolling_topk_mg

    rng = random.Random(9)
    rows = []
    for _ in range(500):
        day = rng.randrange(0, 12)
        if day == 5:  # gap day: no anchor
            continue
        key = f"t{rng.randrange(0, 6)}"
        rows.append((key, dt.datetime(2024, 1, 1) + dt.timedelta(days=day)))
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = {
        (r["period"], r["key"]): r["est_count"]
        for r in rolling_topk_mg(df, "k", "ts", k=64, window=4).collect()
    }
    base = 1704067200 // 86400
    by_day = {}
    for key, t in rows:
        d = base + (t - dt.datetime(2024, 1, 1)).days
        by_day.setdefault(d, {}).setdefault(key, 0)
        by_day[d][key] += 1
    want = {}
    for d in by_day:
        for back in range(4):
            for key, c in by_day.get(d - back, {}).items():
                want[(d, key)] = want.get((d, key), 0) + 0  # anchor init
        for back in range(4):
            for key, c in by_day.get(d - back, {}).items():
                want[(d, key)] += c
    assert got == want
    assert not any(p == base + 5 for p, _ in got)


def test_rolling_topk_truncation_and_order(spark):
    from xorfilter_net_spark.sketches.rolling import rolling_topk_mg

    rows = (
        [("a", dt.datetime(2024, 1, 1))] * 5
        + [("b", dt.datetime(2024, 1, 1))] * 3
        + [("c", dt.datetime(2024, 1, 1))] * 3
        + [("d", dt.datetime(2024, 1, 1))]
    )
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = rolling_topk_mg(df, "k", "ts", k=64, window=2, top=2).collect()
    # deterministic: count desc then key asc -> a(5), b(3); c tied with b
    # loses on key order
    assert [(r["key"], r["est_count"]) for r in got] == [("a", 5), ("b", 3)]


def test_grouped_rolling_distinct_vs_python_replay(spark):
    rng = random.Random(13)
    rows = []
    for _ in range(400):
        g = f"t{rng.randrange(3)}"
        day = rng.randrange(0, 10)
        if (g, day) == ("t1", 4):  # per-group gap day
            continue
        rows.append((g, rng.randrange(0, 30),
                     dt.datetime(2024, 1, 1) + dt.timedelta(days=day)))
    df = spark.createDataFrame(rows, "g string, u long, ts timestamp")
    got = {
        (r["g"], r["period"]): r["n_rolling"]
        for r in rolling_distinct_exact(
            df, "u", "ts", 1000, window=3, group_cols=["g"]
        ).collect()
    }
    base = 1704067200 // 86400
    by = {}
    for g, u, t in rows:
        d = base + (t - dt.datetime(2024, 1, 1)).days
        by.setdefault((g, d), set()).add(u)
    want = {
        (g, d): len(
            set().union(*(by.get((g, d - k), set()) for k in range(3)))
        )
        for (g, d) in by
    }
    assert got == want
    # a group's gap day is not an anchor FOR THAT GROUP even when other
    # groups are active then
    assert ("t1", base + 4) not in got
    assert any(p == base + 4 for (g, p) in got if g != "t1")
