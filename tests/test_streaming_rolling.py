"""streaming/rolling.py: replay skip + version pruning on the period
store, batch-split invariance (OR-merge), and the registered streaming
query's batch-recomputation oracle parity."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

from xorfilter_net_spark.sketches.bitmap import BitmapSketch
from xorfilter_net_spark.streaming.rolling import (
    apply_batch,
    init_period_store,
    read_period_states,
    rolling_from_store,
)


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def test_apply_replay_and_split_invariance(spark):
    sk = BitmapSketch(1000, key_col="__k")
    day = lambda d: dt.datetime(2024, 1, d)
    all_rows = [(u, day(1 + (u * 3) % 5)) for u in range(60)]

    # one store fed everything at once; another fed in two splits
    roots = [tempfile.mkdtemp(prefix="sroll_") for _ in range(2)]
    for r in roots:
        init_period_store(spark, r)
    apply_batch(
        spark, roots[0], _events(spark, all_rows), 0, sk,
        "user_id", "ts", 86400,
    )
    apply_batch(
        spark, roots[1], _events(spark, all_rows[:25]), 0, sk,
        "user_id", "ts", 86400,
    )
    apply_batch(
        spark, roots[1], _events(spark, all_rows[25:]), 1, sk,
        "user_id", "ts", 86400,
    )
    out = [
        sorted(
            tuple(r)
            for r in rolling_from_store(spark, root, 1000, 3).collect()
        )
        for root in roots
    ]
    assert out[0] == out[1]
    assert len(out[0]) == 5

    # replay of batch 1 is a no-op
    before = sorted(
        (r["period"], bytes(r["state"]))
        for r in read_period_states(spark, roots[1]).collect()
    )
    res = apply_batch(
        spark, roots[1], _events(spark, all_rows[25:]), 1, sk,
        "user_id", "ts", 86400,
    )
    assert res["skipped_replay"] is True
    after = sorted(
        (r["period"], bytes(r["state"]))
        for r in read_period_states(spark, roots[1]).collect()
    )
    assert before == after

    # version pruning keeps the last two data dirs
    kept = sorted(
        d for d in os.listdir(roots[1]) if d.startswith("data_v")
    )
    assert kept == ["data_v1", "data_v2"]


def test_streaming_query_matches_batch_oracle(spark, sf_tiny):
    import duckdb

    from xorfilter_net_spark import entrypoints

    got = sorted(
        tuple(r)
        for r in entrypoints.QUERIES["streaming_rolling_distinct"](
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
            entrypoints.ORACLES["streaming_rolling_distinct"]
        ).fetchall()
    )
    assert got == want
    assert len(got) > 5


def test_moment_store_equals_batch_operator(spark, sf_tiny):
    """Maintained moment states -> anomaly report must equal the batch
    operator row for row (same quantization, same flag arithmetic)."""
    import tempfile

    from xorfilter_net_spark.relational.timeseries import (
        rolling_moment_anomalies,
    )
    from xorfilter_net_spark.sketches.moments import MomentSketch
    from xorfilter_net_spark.sources.session import load_table
    from xorfilter_net_spark.streaming.rolling import (
        apply_batch,
        moment_anomalies_from_store,
    )

    ev = load_table(spark, sf_tiny, "events").select("event_id", "value", "ts")
    sk = MomentSketch(quant=1000, value_col="__k")
    store = tempfile.mkdtemp(prefix="sanom_")
    init_period_store(spark, store)
    apply_batch(
        spark, store, ev.filter("event_id % 3 != 2"), 0, sk,
        "value", "ts", 86400,
    )
    apply_batch(
        spark, store, ev.filter("event_id % 3 = 2"), 1, sk,
        "value", "ts", 86400,
    )
    got = sorted(
        tuple(r) for r in moment_anomalies_from_store(spark, store).collect()
    )
    want = sorted(
        tuple(r)
        for r in rolling_moment_anomalies(ev, "value", "ts", window=7).collect()
    )
    assert got == want


def test_moment_sketch_unit():
    import pandas as pd

    from xorfilter_net_spark.sketches.moments import MomentSketch

    sk = MomentSketch(quant=1000, value_col="v")
    st = sk.update(sk.zero(), pd.DataFrame({"v": [1.5, -2.25, None]}))
    assert st == (2, 1500 - 2250, 1500**2 + 2250**2)
    # merge = addition; serialize round-trips python-int state
    two = sk.merge(st, sk.deserialize(sk.serialize(st)))
    assert two == (4, 2 * (1500 - 2250), 2 * (1500**2 + 2250**2))
    # arbitrary-precision: values far past the int64 envelope survive
    big = sk.update(sk.zero(), pd.DataFrame({"v": [9e15] * 3}))
    assert big[2] == 3 * (int(9e15) * 1000) ** 2
