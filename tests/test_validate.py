"""pipeline/validate.py: per-kind violation counts, the one-scan plan
claim for row-local checks, and the registered-query oracle parity."""

from __future__ import annotations

import pytest

from xorfilter_net_spark.pipeline.validate import (
    complete,
    in_range,
    matches,
    refers_to,
    unique,
    validate,
)


@pytest.fixture(scope="module")
def toy(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", -5.0),
            (3, None, 50.0),
            (3, "dd", 200.0),
            (4, "e!", None),
        ],
        "id long, tag string, v double",
    )


def report(df, checks):
    return {
        r["check"]: (r["n_rows"], r["n_violations"], r["passed"])
        for r in validate(df, checks).collect()
    }


def test_row_and_unique_checks(spark, toy):
    got = report(
        toy,
        [
            complete("tag"),
            unique("id"),
            in_range("v", 0, 100),
            matches("tag", "^[a-z]+$"),
        ],
    )
    assert got["complete(tag)"] == (5, 1, False)
    assert got["unique(id)"] == (5, 1, False)  # id 3 twice
    # v=-5 and v=200 out of range; NULL v is not a violation
    assert got["in_range(v)"] == (5, 2, False)
    # 'e!' fails the regex; NULL tag is not a violation here
    assert got["matches(tag)"] == (5, 1, False)


def test_all_pass(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, tag string")
    got = report(df, [complete("tag"), unique("id")])
    assert all(v == (2, 0, True) for v in got.values())


def test_referential(spark, toy):
    dim = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    got = report(toy, [refers_to("id", dim, "k")])
    assert got["refers_to(id)"] == (5, 1, False)  # id=4 is an orphan


def test_unknown_kind_raises(spark, toy):
    from xorfilter_net_spark.pipeline.validate import Check

    with pytest.raises(ValueError):
        validate(toy, [Check("bad", "nope")])


def test_local_checks_share_one_scan(spark, sf_tiny):
    """All row-local + uniqueness checks must compile to ONE scan of the
    events parquet (the Deequ lesson: don't run one job per check)."""
    from xorfilter_net_spark.sources.session import load_table

    ev = load_table(spark, sf_tiny, "events")
    rep = validate(
        ev,
        [
            complete("event_type"),
            unique("event_id"),
            unique("user_id"),
            in_range("value", 0, 250),
        ],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan


def test_registered_query_matches_duckdb_oracle(spark, sf_tiny):
    import duckdb

    from xorfilter_net_spark import entrypoints

    got = {
        r["check"]: (r["n_rows"], r["n_violations"], r["passed"])
        for r in entrypoints.QUERIES["data_validation_report"](
            spark, sf_tiny
        ).collect()
    }
    con = duckdb.connect()
    for t in ("events", "orders", "customer"):
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{sf_tiny}/{t}.parquet')"
        )
    want = {
        check: (n, v, passed)
        for check, n, v, passed in con.execute(
            entrypoints.ORACLES["data_validation_report"]
        ).fetchall()
    }
    assert got == want
    assert got["unique(user_id)"][2] is False  # non-vacuous failure row
