"""streaming/ivm.py: exactly-once replay skip, version pruning,
checkpoint-restart no-op, and the registered streaming query's oracle
parity (streaming maintenance == batch recomputation)."""

from __future__ import annotations

import os
import tempfile

from xorfilter_net_spark.streaming.ivm import (
    apply_batch,
    init_view,
    read_view,
    view_meta,
)


def _view(spark, view_dir):
    return {
        r["g"]: (r["n"], r["sum_v"])
        for r in read_view(spark, view_dir).collect()
    }


def test_apply_batch_and_replay_skip(spark):
    root = tempfile.mkdtemp(prefix="sivm_")
    view = os.path.join(root, "v")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 5)], "id long, g string, v long"
    )
    init_view(base, view, ["g"], ["v"])
    changes = spark.createDataFrame(
        [("a", 7, "insert"), ("b", 5, "delete")],
        "g string, v long, change_type string",
    )
    r1 = apply_batch(spark, view, changes, 0, ["g"], ["v"])
    assert r1["version"] == 1
    assert _view(spark, view) == {"a": (2, 17)}  # 'b' vanished
    # replay of the SAME batch id must be a no-op
    r2 = apply_batch(spark, view, changes, 0, ["g"], ["v"])
    assert r2["skipped_replay"] is True
    assert view_meta(view)["current"] == 1
    assert _view(spark, view) == {"a": (2, 17)}


def test_version_pruning(spark):
    root = tempfile.mkdtemp(prefix="sivm_")
    view = os.path.join(root, "v")
    base = spark.createDataFrame([(1, "a", 1)], "id long, g string, v long")
    init_view(base, view, ["g"], ["v"])
    for b in range(3):
        ch = spark.createDataFrame(
            [("a", 1, "insert")], "g string, v long, change_type string"
        )
        apply_batch(spark, view, ch, b, ["g"], ["v"])
    kept = sorted(d for d in os.listdir(view) if d.startswith("data_v"))
    assert kept == ["data_v2", "data_v3"]  # last two only
    assert _view(spark, view) == {"a": (4, 4)}


def test_streaming_query_matches_oracle_and_restart(spark, sf_tiny):
    import duckdb

    from xorfilter_net_spark import entrypoints

    got = sorted(
        tuple(r)
        for r in entrypoints.QUERIES["streaming_ivm_view"](
            spark, sf_tiny
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{sf_tiny}/documents.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            entrypoints.ORACLES["streaming_ivm_view"]
        ).fetchall()
    )
    assert got == want
    assert len(got) > 1
