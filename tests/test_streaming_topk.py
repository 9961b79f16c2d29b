"""streaming/topk.py: exactly-once Misra-Gries maintenance under a real
file-source stream — stream == batch parity (exact in the below-k
regime), replay idempotence, and batch-split invariance."""

from __future__ import annotations

import os
import tempfile
import time

from pyspark.sql import functions as F

from xorfilter_net_spark.sketches.misra_gries import MisraGriesSketch
from xorfilter_net_spark.sources.transcripts import load_transcripts
from xorfilter_net_spark.streaming.incremental import SketchAccumulator
from xorfilter_net_spark.streaming.topk import (
    heavy_hitters_df,
    stream_heavy_hitters,
)


def _staged_stream(spark, sf_dir, root, splits=2):
    t = load_transcripts(spark, sf_dir).select("conv_id", "tool")
    t0 = time.time() - 3600
    for i in range(splits):
        p = os.path.join(root, "in", f"s{i}")
        t.filter(f"crc32(conv_id) % {splits} = {i}").repartition(1).write.mode(
            "overwrite"
        ).parquet(p)
        for r, _, fs in os.walk(p):
            for f in fs:
                os.utime(os.path.join(r, f), (t0 + 10 * i, t0 + 10 * i))
    return (
        spark.readStream.schema(t.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(root, "in", "s*"))
    ), t


def test_stream_equals_batch_groupby(spark, sf_tiny):
    root = tempfile.mkdtemp(prefix="stopk_")
    stream, t = _staged_stream(spark, sf_tiny, root)
    acc = stream_heavy_hitters(
        stream, "tool", os.path.join(root, "state"),
        os.path.join(root, "ckpt"), k=64,
    )
    got = {
        (r["key"], r["est_count"])
        for r in heavy_hitters_df(spark, acc).collect()
    }
    want = {
        (r["tool"], r["n"])
        for r in t.filter("tool is not null")
        .groupBy("tool")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
    # below-k regime really held (5 distinct tools << 64)
    assert len(got) < 64


def test_replay_is_idempotent(spark, sf_tiny):
    root = tempfile.mkdtemp(prefix="stopk_")
    sk = MisraGriesSketch(k=64, key_col="tool")
    acc = SketchAccumulator(sk, os.path.join(root, "state"))
    t = (
        load_transcripts(spark, sf_tiny)
        .select("tool")
        .filter("tool is not null")
    )
    acc.merge_batch(t, 0, ["tool"])
    once = acc.sketch.finish(acc.load()[0])
    acc.merge_batch(t, 0, ["tool"])  # same batch id -> ledger skip
    twice = acc.sketch.finish(acc.load()[0])
    assert once == twice


def test_split_invariance(spark, sf_tiny):
    sk = MisraGriesSketch(k=64, key_col="tool")
    t = (
        load_transcripts(spark, sf_tiny)
        .select("conv_id", "tool")
        .filter("tool is not null")
    )
    a = SketchAccumulator(sk, tempfile.mkdtemp(prefix="stopk_") + "/s")
    a.merge_batch(t.select("tool"), 0, ["tool"])
    b = SketchAccumulator(sk, tempfile.mkdtemp(prefix="stopk_") + "/s")
    b.merge_batch(t.filter("crc32(conv_id) % 3 = 0").select("tool"), 0, ["tool"])
    b.merge_batch(t.filter("crc32(conv_id) % 3 = 1").select("tool"), 1, ["tool"])
    b.merge_batch(t.filter("crc32(conv_id) % 3 = 2").select("tool"), 2, ["tool"])
    assert sk.finish(a.load()[0]) == sk.finish(b.load()[0])
