"""Streaming MERGE INTO the versioned table (streaming/table_sink.py).

Pins the exactly-once contract: each micro-batch commits one table
version in arrival order, replayed batch_ids are skipped (the ledger
lives inside the manifest, atomic with the data), checkpoint restart
with no new input commits nothing, and deletes ride the marker column.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from xorfilter_net_spark.sources.timetravel import (
    create_table,
    current_version,
    read_manifest,
    read_table,
)
from xorfilter_net_spark.streaming.table_sink import (
    _merge_batch,
    applied_batches,
    stream_merge_into,
)

SCHEMA = "k long, v string"


def _write_slice(df, path: str, mtime: float) -> None:
    df.repartition(1).write.mode("overwrite").parquet(path)
    for root, _, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))


def _setup(spark, tmp_path):
    table = str(tmp_path / "table")
    base = spark.createDataFrame(
        [(k, f"base{k}") for k in range(20)], SCHEMA
    )
    create_table(base, table, "k", n_buckets=4)
    return table


def test_stream_batches_commit_in_order(spark, tmp_path):
    table = _setup(spark, tmp_path)
    t0 = time.time() - 3600
    s0 = spark.createDataFrame([(1, "u1a"), (21, "ins21")], SCHEMA)
    s1 = spark.createDataFrame([(1, "u1b"), (2, "u2")], SCHEMA)
    _write_slice(s0, str(tmp_path / "in/s0"), t0)
    _write_slice(s1, str(tmp_path / "in/s1"), t0 + 10)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "in/s*"))
    )
    q = stream_merge_into(stream, table, str(tmp_path / "ckpt"))
    q.awaitTermination()

    got = {r.k: r.v for r in read_table(spark, table).collect()}
    assert got[1] == "u1b"  # batch 1 overwrote batch 0's upsert
    assert got[2] == "u2" and got[21] == "ins21"
    assert got[0] == "base0"
    assert current_version(table) == 2
    assert applied_batches(table) == {0, 1}
    # time travel through the micro-batch history
    v1 = {r.k: r.v for r in read_table(spark, table, version=1).collect()}
    assert v1[1] == "u1a" and 2 not in {k for k in v1 if v1[k] == "u2"}


def test_replayed_batch_id_is_skipped(spark, tmp_path):
    table = _setup(spark, tmp_path)
    d = spark.createDataFrame([(3, "x")], SCHEMA)
    info = _merge_batch(spark, table, d, batch_id=0, deleted_col=None)
    assert info["version"] == 1
    before = sorted((r.k, r.v) for r in read_table(spark, table).collect())
    # crash/retry: same batch_id delivered again with ANY payload
    replay = _merge_batch(
        spark, table, spark.createDataFrame([(3, "WRONG")], SCHEMA),
        batch_id=0, deleted_col=None,
    )
    assert replay == {"skipped_replay": True, "batch_id": 0}
    assert current_version(table) == 1
    after = sorted((r.k, r.v) for r in read_table(spark, table).collect())
    assert after == before


def test_restart_with_checkpoint_commits_nothing(spark, tmp_path):
    table = _setup(spark, tmp_path)
    _write_slice(
        spark.createDataFrame([(5, "u5")], SCHEMA),
        str(tmp_path / "in/s0"),
        time.time() - 3600,
    )

    def run():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(tmp_path / "in/s*"))
        )
        q = stream_merge_into(stream, table, str(tmp_path / "ckpt"))
        q.awaitTermination()

    run()
    v_after_first = current_version(table)
    run()  # restart from the same checkpoint, no new files
    assert current_version(table) == v_after_first
    assert applied_batches(table) == {0}


def test_deletes_via_marker_column(spark, tmp_path):
    table = _setup(spark, tmp_path)
    d = spark.createDataFrame(
        [(4, "dead", True), (6, "u6", False)], "k long, v string, __del boolean"
    )
    _merge_batch(spark, table, d, batch_id=0, deleted_col="__del")
    got = {r.k: r.v for r in read_table(spark, table).collect()}
    assert 4 not in got and got[6] == "u6"
    # applied ledger survives a following plain merge (carry-forward)
    from xorfilter_net_spark.sources.timetravel import merge_into

    merge_into(spark, table, spark.createDataFrame([(7, "u7")], SCHEMA))
    assert applied_batches(table) == {0}
    m = read_manifest(table)
    assert m["version"] == 2
