"""Unit tests for relational/: as-of join, sessionization, salted join.

Driver-contract-level equivalence (DuckDB ASOF JOIN / window-program
oracles at sf0.01) is covered by tools/check_contract.py; these pin the
operator semantics on adversarial micro-inputs — ties, no-match rows,
exact-gap boundaries — where oracle data may never land.
"""

from __future__ import annotations

import datetime as dt

import pytest

from xorfilter_net_spark.relational import asof_join, salted_join, sessionize


def _ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def left(spark):
    return spark.createDataFrame(
        [
            ("u1", _ts(10), "L-early"),  # before any right row -> null match
            ("u1", _ts(20), "L-tie"),  # exactly simultaneous right row matches
            ("u1", _ts(45), "L-late"),  # latest prior wins, not first
            ("u2", _ts(30), "L-other-key"),  # keys do not cross
        ],
        "k string, ts timestamp, tag string",
    )


@pytest.fixture(scope="module")
def right(spark):
    return spark.createDataFrame(
        [
            ("u1", _ts(20), 200),
            ("u1", _ts(40), 400),
            ("u1", _ts(50), 500),  # in the future of every left row
            ("u3", _ts(0), 999),  # key absent on the left
        ],
        "k string, ts timestamp, v int",
    )


def test_asof_latest_prior_or_equal(left, right):
    rows = {
        r["tag"]: (r["ts_asof"], r["v_asof"])
        for r in asof_join(left, right, on="k", ts="ts").collect()
    }
    assert rows["L-early"] == (None, None)
    assert rows["L-tie"] == (_ts(20), 200)  # <= includes the tie
    assert rows["L-late"] == (_ts(40), 400)  # latest prior, not _ts(20)
    assert rows["L-other-key"] == (None, None)
    assert len(rows) == 4  # every left row survives exactly once


def test_asof_single_shuffle_plan(left, right):
    plan = (
        asof_join(left, right, on="k", ts="ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one window over the union, no join operator at all
    assert plan.lower().count("exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_sessionize_gap_boundaries(spark):
    gap_s = 30 * 60
    base = dt.datetime(2024, 1, 1)
    rows = [
        # u1: gaps of (gap-1s, exactly gap, gap+1s) -> the exactly-gap
        # successor still merges (session_window is end-closed); only
        # the strictly-greater gap breaks the session
        ("u1", base),
        ("u1", base + dt.timedelta(seconds=gap_s - 1)),
        ("u1", base + dt.timedelta(seconds=2 * gap_s - 1)),
        ("u1", base + dt.timedelta(seconds=3 * gap_s)),
        # u2: single event -> its own session
        ("u2", base),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = {
        (r["k"], r["session_start"]): r["n_events"]
        for r in sessionize(df, key="k", ts="ts", gap="30 minutes").collect()
    }
    assert got == {
        ("u1", base): 3,
        ("u1", base + dt.timedelta(seconds=3 * gap_s)): 1,
        ("u2", base): 1,
    }


def test_salted_join_matches_plain_join(spark):
    big = spark.createDataFrame(
        [(i, i % 3) for i in range(300)], "row_id long, k long"
    )
    small = spark.createDataFrame([(0, "a"), (1, "b")], "k long, attr string")
    got = sorted(
        (r["row_id"], r["attr"])
        for r in salted_join(big, small, on="k", salt_src="row_id").collect()
    )
    want = sorted(
        (r["row_id"], r["attr"]) for r in big.join(small, "k").collect()
    )
    assert got == want  # inner join drops k=2, keeps 200 rows
    assert len(got) == 200


def test_salted_join_spreads_hot_key(spark):
    from pyspark.sql import functions as F

    big = spark.createDataFrame(
        [(i, 7) for i in range(1000)], "row_id long, k long"
    )
    small = spark.createDataFrame([(7, "hot")], "k long, attr string")
    n_salts = 8
    salt = F.pmod(F.xxhash64("row_id"), F.lit(n_salts)).cast("int")
    n_buckets = (
        big.withColumn("s", salt).select("s").distinct().count()
    )
    assert n_buckets == n_salts  # the hot key really fans out
    assert salted_join(big, small, on="k", salt_src="row_id", num_salts=n_salts).count() == 1000
