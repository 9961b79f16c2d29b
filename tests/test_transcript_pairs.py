"""streaming/transcript_pairs.py: append-mode session close semantics,
cross-micro-batch state merge, and batch parity."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from xorfilter_net_spark.streaming.transcript_pairs import (
    stream_transcript_pairs,
)

BASE = 1_700_000_000
SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, ts timestamp"
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(c, i, r, t, s) for c, i, r, t, s in rows],
        "conv_id string, turn_idx int, role string, text string, ts long",
    ).withColumn("ts", F.timestamp_seconds("ts"))


# conversation A straddles the first two micro-batches; B lives in the
# second; the third is a lone far-future row that advances the watermark
# past A and B so append mode closes and emits them (its own session
# stays open and must NOT emit pairs — and has no assistant turn anyway)
BATCH1 = [
    ("A", 0, "user", "hi there", BASE + 0),
    ("A", 1, "assistant", "hello back", BASE + 1),
]
BATCH2 = [
    ("A", 2, "tool", "tool ran", BASE + 2),
    ("A", 3, "assistant", "done now", BASE + 3),
    ("B", 0, "user", "ask", BASE + 500),
    ("B", 1, "assistant", "answer", BASE + 501),
]
BATCH3 = [("ZZ-sentinel", 0, "user", "tick", BASE + 10_000_000)]

EXPECTED = {
    ("A", 1): ("user: hi there", "hello back"),
    ("A", 3): (
        "user: hi there\nassistant: hello back\ntool: tool ran",
        "done now",
    ),
    ("B", 1): ("user: ask", "answer"),
}


def test_append_mode_closes_sessions_across_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    t0 = 1_000_000_000
    for i, rows in enumerate((BATCH1, BATCH2, BATCH3)):
        p = os.path.join(src, f"b{i}")
        _df(spark, rows).repartition(1).write.parquet(p)
        for r, _, fs in os.walk(p):
            for f in fs:
                os.utime(os.path.join(r, f), (t0 + 10 * i, t0 + 10 * i))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "b*"))
    )
    pairs = stream_transcript_pairs(
        stream, gap="1 minute", watermark_delay="10 minutes"
    )
    q = (
        pairs.writeStream.format("memory")
        .queryName("stp_append_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["conv_id"], r["turn_idx"]): (r["context"], r["target"])
        for r in spark.table("stp_append_sink").collect()
    }
    # A's two halves merged into ONE session in the state store: turn 3's
    # context reaches back into the earlier micro-batch
    assert got == EXPECTED


def test_batch_fallback_parity(spark):
    batch = _df(spark, BATCH1 + BATCH2 + BATCH3).repartition(3)
    got = {
        (r["conv_id"], r["turn_idx"]): (r["context"], r["target"])
        for r in stream_transcript_pairs(batch, gap="1 minute").collect()
    }
    assert got == EXPECTED  # sentinel has no assistant turn -> no pairs


def test_context_depth_parameter(spark):
    batch = _df(spark, BATCH1 + BATCH2)
    got = {
        (r["conv_id"], r["turn_idx"]): r["context"]
        for r in stream_transcript_pairs(
            batch, gap="1 minute", context_turns=1
        ).collect()
    }
    assert got[("A", 3)] == "tool: tool ran"
    assert got[("A", 1)] == "user: hi there"
