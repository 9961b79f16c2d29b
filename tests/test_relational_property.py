"""Property tests for relational/: random inputs vs independent oracles.

- asof_join is checked against pandas.merge_asof (a third, non-Spark,
  non-DuckDB implementation of the same semantics);
- interval_join is checked against the naive inequality join on the
  same Spark session (different physical plan, same logical result).

Hypothesis drives the shapes; examples are kept small so each case is a
sub-second Spark job, with deadline disabled (JVM warmup skews the
first example).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

BASE = dt.datetime(2024, 1, 1)


def _times(draw, n):
    offsets = draw(
        st.lists(st.integers(0, 10_000), min_size=n, max_size=n)
    )
    return [BASE + dt.timedelta(seconds=s) for s in offsets]


@st.composite
def asof_case(draw):
    n_left = draw(st.integers(1, 12))
    n_right = draw(st.integers(0, 12))
    keys = ["a", "b"]
    left = [
        (draw(st.sampled_from(keys)), ts, i)
        for i, ts in enumerate(_times(draw, n_left))
    ]
    right = [
        (draw(st.sampled_from(keys)), ts, 100 + i)
        for i, ts in enumerate(_times(draw, n_right))
    ]
    return left, right


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=asof_case())
def test_asof_join_matches_pandas_merge_asof(spark, case):
    from xorfilter_net_spark.relational import asof_join

    left_rows, right_rows = case
    left = spark.createDataFrame(left_rows, "k string, ts timestamp, lid int")
    # collapse right to one row per (k, ts) — with duplicate timestamps
    # per key, WHICH row wins is tie-ambiguous in every engine; the
    # operator contract (and the driver-contract query) pre-dedups
    rp = pd.DataFrame(right_rows, columns=["k", "ts", "v"])
    if len(rp):
        rp = rp.groupby(["k", "ts"], as_index=False)["v"].max()
    right = (
        spark.createDataFrame(rp, "k string, ts timestamp, v int")
        if len(rp)
        else spark.createDataFrame([], "k string, ts timestamp, v int")
    )

    got = {
        r["lid"]: r["v_asof"]
        for r in asof_join(left, right, on="k", ts="ts").collect()
    }

    lp = pd.DataFrame(left_rows, columns=["k", "ts", "lid"]).sort_values("ts")
    if len(rp):
        want_df = pd.merge_asof(
            lp, rp.sort_values("ts"), on="ts", by="k", direction="backward",
            allow_exact_matches=True,
        )
    else:
        want_df = lp.assign(v=None)
    want = {
        int(r.lid): (None if pd.isna(r.v) else int(r.v))
        for r in want_df.itertuples()
    }
    assert got == want


@st.composite
def interval_case(draw):
    n_points = draw(st.integers(1, 15))
    n_iv = draw(st.integers(1, 8))
    points = [
        (i, draw(st.sampled_from(["u", "w"])), ts)
        for i, ts in enumerate(_times(draw, n_points))
    ]
    ivs = []
    for j in range(n_iv):
        start = draw(st.integers(0, 10_000))
        length = draw(st.integers(0, 5_000))
        ivs.append(
            (
                j,
                draw(st.sampled_from(["u", "w"])),
                BASE + dt.timedelta(seconds=start),
                BASE + dt.timedelta(seconds=start + length),
            )
        )
    return points, ivs


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=interval_case())
def test_interval_join_matches_naive_on_random_inputs(spark, case):
    from pyspark.sql import functions as F

    from xorfilter_net_spark.relational import interval_join

    point_rows, iv_rows = case
    points = spark.createDataFrame(
        point_rows, "pid int, user_id string, ts timestamp"
    )
    ivs = spark.createDataFrame(
        iv_rows, "iid int, user_id string, start_ts timestamp, end_ts timestamp"
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(
            points, ivs, "ts", "start_ts", "end_ts",
            bucket_s=1800, extra_key="user_id",
        ).collect()
    )
    want = sorted(
        (r["pid"], r["iid"])
        for r in points.alias("p")
        .join(
            ivs.alias("i"),
            (F.col("p.user_id") == F.col("i.user_id"))
            & (F.col("p.ts") >= F.col("i.start_ts"))
            & (F.col("p.ts") < F.col("i.end_ts")),
        )
        .collect()
    )
    assert got == want
