"""relational/scd.py::temporal_join + pipeline/validate.py::
suggest_checks: unit semantics and registered-query oracle parity."""

from __future__ import annotations

import datetime as dt

import pytest

from xorfilter_net_spark.pipeline.profile import profile_columns
from xorfilter_net_spark.pipeline.validate import suggest_checks, validate
from xorfilter_net_spark.relational.scd import scd2_history, temporal_join


def ts(day, sec=0):
    return dt.datetime(2024, 1, day, 0, 0, sec)


def test_temporal_join_picks_covering_version(spark):
    changes = spark.createDataFrame(
        [(1, "a", ts(1), 0), (1, "b", ts(5), 1), (1, "c", ts(9), 2)],
        "k long, attr string, ts timestamp, eid long",
    )
    hist = scd2_history(changes, "k", "attr", "ts", "eid").drop("is_current")
    fact = spark.createDataFrame(
        [
            (100, 1, ts(3)),   # inside [1, 5) -> 'a'
            (101, 1, ts(5)),   # boundary: valid_from inclusive -> 'b'
            (102, 1, ts(20)),  # open version -> 'c'
            (103, 1, dt.datetime(2023, 12, 1)),  # before history -> drop
            (104, 2, ts(3)),   # unknown key -> drop
        ],
        "fid long, k long, fts timestamp",
    )
    got = {
        r["fid"]: r["attr"]
        for r in temporal_join(fact, hist, "k", "fts").collect()
    }
    assert got == {100: "a", 101: "b", 102: "c"}


def test_suggest_checks_rules_and_pass(spark):
    df = spark.createDataFrame(
        [(1, "x", 5.0), (2, "y", 9.0), (3, "x", None)],
        "id long, tag string, v double",
    )
    checks = suggest_checks(profile_columns(df))
    names = sorted(c.name for c in checks)
    # id: complete + unique + in_range; tag: complete (dups, no unique);
    # v: in_range only (has a null, not complete; 2 distinct of 2 -> unique)
    assert names == [
        "complete(id)",
        "complete(tag)",
        "in_range(id)",
        "in_range(v)",
        "unique(id)",
        "unique(v)",
    ]
    rep = validate(df, checks)
    assert all(r["passed"] for r in rep.collect())


def test_suggest_checks_regex_passthrough(spark):
    df = spark.createDataFrame([(1, "ab")], "id long, tag string")
    checks = suggest_checks(
        profile_columns(df), matches_regexes={"tag": "^[a-z]+$"}
    )
    assert any(c.name == "matches(tag)" for c in checks)


@pytest.mark.parametrize(
    "name", ["q_temporal_join_events_scd2", "data_validation_suggested"]
)
def test_registered_queries_match_duckdb(spark, sf_tiny, name):
    import duckdb

    from xorfilter_net_spark import entrypoints

    got = sorted(
        tuple(r) for r in entrypoints.QUERIES[name](spark, sf_tiny).collect()
    )
    con = duckdb.connect()
    con.execute(
        "create view events as select * from "
        f"read_parquet('{sf_tiny}/events.parquet')"
    )
    want = sorted(
        tuple(r) for r in con.execute(entrypoints.ORACLES[name]).fetchall()
    )
    assert got == want
    assert len(got) > 0
