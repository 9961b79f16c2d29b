"""relational/timeseries.py: OHLC bucket semantics (ties, nulls),
gap-fill LOCF semantics, and registered-query oracle parity."""

from __future__ import annotations

import datetime as dt

import pytest

from xorfilter_net_spark.relational.timeseries import (
    gapfill_forward,
    resample_ohlc,
)


def ts(day, hour=0, sec=0):
    return dt.datetime(2024, 1, day, hour, 0, sec)


def test_ohlc_semantics(spark):
    rows = [
        # one 6h bucket: open=5 (earliest), close=9 (latest), high=20, low=2
        ("a", ts(1, 0), 5.0, 1),
        ("a", ts(1, 1), 20.0, 2),
        ("a", ts(1, 2), 2.0, 3),
        ("a", ts(1, 3), 9.0, 4),
        # same ts tie -> tiebreak id decides open
        ("b", ts(1, 0), 7.0, 10),
        ("b", ts(1, 0), 3.0, 9),
        # null value excluded entirely
        ("a", ts(1, 4), None, 5),
    ]
    df = spark.createDataFrame(
        rows, "et string, ts timestamp, value double, eid long"
    )
    got = {
        (r["key"], r["bucket"]): (
            r["open"], r["high"], r["low"], r["close"], r["n"]
        )
        for r in resample_ohlc(df, "et", "ts", "value", "eid", 21600).collect()
    }
    b = 1704067200 * 1_000_000 // 21_600_000_000
    assert got[("a", b)] == (5.0, 20.0, 2.0, 9.0, 4)
    assert got[("b", b)] == (3.0, 7.0, 3.0, 7.0, 2)  # eid 9 first


def test_gapfill_locf(spark):
    rows = [
        (1, ts(1)), (1, ts(1, 1)), (1, ts(4)),  # u1: d0 n=2, gap, d3 n=1
        (2, ts(3)),                              # u2: starts day 2
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    got = {
        (r["key"], r["period"]): r["n_filled"]
        for r in gapfill_forward(df, "u", "ts", 86400).collect()
    }
    d0 = 1704067200 // 86400
    assert got == {
        (1, d0): 2, (1, d0 + 1): 2, (1, d0 + 2): 2, (1, d0 + 3): 1,
        (2, d0 + 2): 1, (2, d0 + 3): 1,  # u2 grid starts at ITS first day
    }


def test_validation(spark):
    df = spark.createDataFrame([(1, ts(1), 1.0, 1)], "u long, ts timestamp, v double, e long")
    with pytest.raises(ValueError):
        resample_ohlc(df, "u", "ts", "v", "e", 0)
    with pytest.raises(ValueError):
        gapfill_forward(df, "u", "ts", -1)


@pytest.mark.parametrize(
    "name", ["q_ohlc_resample_events", "q_gapfill_user_daily"]
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


class TestRollingMomentAnomalies:
    def test_planted_spike_flags(self, spark):
        import datetime as dt

        from xorfilter_net_spark.relational.timeseries import (
            rolling_moment_anomalies,
        )

        rows = []
        # 10 calm days around 10.0 +- 0.2, then a day-11 spike at 50.0
        for day in range(10):
            for i in range(20):
                rows.append(
                    (10.0 + 0.2 * ((i % 5) - 2),
                     dt.datetime(2024, 1, 1) + dt.timedelta(days=day, hours=i % 24))
                )
        for i in range(20):
            rows.append(
                (50.0, dt.datetime(2024, 1, 11) + dt.timedelta(hours=i % 24))
            )
        df = spark.createDataFrame(rows, "value double, ts timestamp")
        out = {
            r["period"]: r
            for r in rolling_moment_anomalies(df, "value", "ts").collect()
        }
        base = 1704067200 // 86400
        # first day: empty prior window -> false
        assert out[base]["n_prior"] == 0
        assert out[base]["is_anomaly"] is False
        # calm mid-run day: not anomalous
        assert out[base + 5]["is_anomaly"] is False
        # the spike day deviates wildly from its prior week
        assert out[base + 10]["is_anomaly"] is True

    def test_python_replay_exact(self, spark):
        import datetime as dt
        import random

        from xorfilter_net_spark.relational.timeseries import (
            rolling_moment_anomalies,
        )

        rng = random.Random(3)
        rows = [
            (rng.uniform(-5, 5),
             dt.datetime(2024, 1, 1) + dt.timedelta(days=rng.randrange(0, 9)))
            for _ in range(300)
        ]
        df = spark.createDataFrame(rows, "value double, ts timestamp")
        got = {
            r["period"]: (
                r["n_day"], r["sum_day_q"], r["n_prior"],
                r["sum_prior_q"], r["sumsq_prior_q"], r["is_anomaly"],
            )
            for r in rolling_moment_anomalies(
                df, "value", "ts", window=3
            ).collect()
        }
        import math

        base = 1704067200 // 86400
        day: dict = {}
        for v, t in rows:
            p = base + (t - dt.datetime(2024, 1, 1)).days
            q = math.floor(float(v) * 1000)
            n, s1, s2 = day.get(p, (0, 0, 0))
            day[p] = (n + 1, s1 + q, s2 + q * q)
        want = {}
        for p, (n_d, s1_d, _) in day.items():
            N = S1 = S2 = 0
            for back in range(1, 4):
                if p - back in day:
                    n, s1, s2 = day[p - back]
                    N, S1, S2 = N + n, S1 + s1, S2 + s2
            if N == 0:
                flag = False
            else:
                flag = (s1_d * N - S1 * n_d) ** 2 > 9 * n_d * n_d * (
                    S2 * N - S1 * S1
                )
            want[p] = (n_d, s1_d, N, S1, S2, flag)
        assert got == want


class TestGroupedTrend:
    def test_known_perfect_lines(self, spark):
        import datetime as dt

        from xorfilter_net_spark.relational.timeseries import grouped_trend

        rows = []
        t0 = dt.datetime(2024, 1, 1)
        # group 'up': y = 2.0 * x_hours + 1.0; group 'flat': constant 5
        for h in range(6):
            rows.append(("up", 2.0 * h + 1.0, t0 + dt.timedelta(hours=h)))
            rows.append(("flat", 5.0, t0 + dt.timedelta(hours=h)))
        # degenerate group: a single point -> NULL rationals
        rows.append(("one", 3.0, t0))
        df = spark.createDataFrame(rows, "g string, value double, ts timestamp")
        out = {
            r["g"]: r
            for r in grouped_trend(df, "g", "ts", "value").collect()
        }
        up = out["up"]
        # exact rational slope = 2000 milli-units/hour
        assert up["slope_num"] == 2000 * up["den"]
        assert up["intercept_num"] == 1000 * up["den"]
        flat = out["flat"]
        assert flat["slope_num"] == 0
        assert flat["intercept_num"] == 5000 * flat["den"]
        assert out["one"]["slope_num"] is None
        assert out["one"]["den"] is None

    def test_python_replay_exact(self, spark):
        import datetime as dt
        import math
        import random

        from xorfilter_net_spark.relational.timeseries import grouped_trend

        rng = random.Random(11)
        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (f"g{rng.randrange(3)}", rng.uniform(-10, 10),
             t0 + dt.timedelta(minutes=rng.randrange(0, 5000)))
            for _ in range(400)
        ]
        df = spark.createDataFrame(rows, "g string, value double, ts timestamp")
        got = {
            r["g"]: (r["n"], r["sx"], r["sy"], r["sxx"], r["sxy"],
                     r["slope_num"], r["den"])
            for r in grouped_trend(df, "g", "ts", "value").collect()
        }
        origin = min(int(t.timestamp() * 1_000_000) for _, _, t in rows)
        acc: dict = {}
        for g, v, t in rows:
            x = (int(t.timestamp() * 1_000_000) - origin) // 3_600_000_000
            y = math.floor(float(v) * 1000)
            n, sx, sy, sxx, sxy = acc.get(g, (0, 0, 0, 0, 0))
            acc[g] = (n + 1, sx + x, sy + y, sxx + x * x, sxy + x * y)
        want = {}
        for g, (n, sx, sy, sxx, sxy) in acc.items():
            den = n * sxx - sx * sx
            want[g] = (
                n, sx, sy, sxx, sxy,
                (n * sxy - sx * sy) if den else None,
                den if den else None,
            )
        assert got == want
