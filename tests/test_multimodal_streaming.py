"""Multimodal binary-column plumbing + streaming incremental sketches."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xorfilter_net_spark.multimodal.media import (
    _fake_pixels,
    decode_media,
    extract_features,
    media_table,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark, sf_tiny):
    docs = spark.read.parquet(f"{sf_tiny}/documents.parquet")
    return media_table(spark, docs).cache()


class TestMultimodal:
    def test_schema_and_payload(self, media):
        assert dict(media.dtypes) == {
            "media_id": "bigint",
            "payload": "binary",
            "media_type": "string",
            "width": "int",
            "height": "int",
            "n_frames": "int",
        }
        r = media.filter("media_id = 5").collect()[0]
        # payload = md5 hex repeated (1 + id%4) times
        assert len(r["payload"]) == 32 * (1 + 5 % 4)

    def test_real_codec_is_stubbed(self):
        with pytest.raises(NotImplementedError):
            decode_media(b"xx", 4, 4, codec="real")

    def test_fake_decode_deterministic_shape(self):
        a = _fake_pixels(b"abcdef", 7, 5)
        b = _fake_pixels(b"abcdef", 7, 5)
        assert a.shape == (5, 7) and a.dtype == np.uint8
        assert (a == b).all()
        assert not (a == _fake_pixels(b"abcdeg", 7, 5)).all()

    def test_feature_extraction_batch(self, media):
        out = extract_features(media)
        rows = out.collect()
        assert len(rows) == media.count()
        for r in rows[:10]:
            assert len(r["feat"]) == 5
            m, s, lo, hi, grad = r["feat"]
            assert 0 <= lo <= m <= hi <= 255 and s >= 0 and grad >= 0

    def test_feature_determinism(self, media):
        a = {r["media_id"]: r["feat"] for r in extract_features(media).collect()}
        b = {r["media_id"]: r["feat"] for r in extract_features(media).collect()}
        assert a == b

    def test_frame_sampling(self, media):
        frames = sample_frames(media, stride=2)
        pdf = frames.toPandas()
        meta = {
            r["media_id"]: (r["n_frames"], len(r["payload"]))
            for r in media.select("media_id", "n_frames", "payload").collect()
        }
        counts = pdf.groupby("media_id").size()
        for mid, cnt in counts.items():
            nf = meta[mid][0]
            assert cnt == len(range(0, nf, 2))
        # frame indices respect the stride
        assert (pdf.frame_idx % 2 == 0).all()

    def test_column_pruning_skips_payload(self, media, spark, tmp_path):
        """Metadata-only queries must not read payload bytes: the parquet
        scan's ReadSchema excludes the binary column."""
        p = str(tmp_path / "media_parquet")
        media.write.parquet(p)
        plan = (
            spark.read.parquet(p)
            .groupBy("media_type")
            .count()
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "payload" not in plan


class TestStreamingIncremental:
    def _stream_parity(self, spark, tmp_path, sketch_factory, cols, make_df):
        """Write 3 parquet slices, stream them with availableNow, and
        compare the accumulated sketch against one batch aggregate."""
        from xorfilter_net_spark.sketches.base import aggregate
        from xorfilter_net_spark.streaming.incremental import (
            run_incremental_sketch,
        )

        src = tmp_path / "src"
        src.mkdir()
        dfs = [make_df(spark, i) for i in range(3)]
        for i, df in enumerate(dfs):
            df.write.parquet(str(src / f"slice{i}"))
        schema = dfs[0].schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "2")
            .parquet(str(src / "slice*"))
        )
        sk = sketch_factory()
        acc = run_incremental_sketch(
            stream,
            cols,
            sk,
            state_dir=str(tmp_path / "state"),
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        state, meta = acc.load()
        full = dfs[0].unionAll(dfs[1]).unionAll(dfs[2])
        batch_state = aggregate(full, cols, sk)
        assert meta["rows"] == full.count()
        return sk, state, batch_state

    def test_streaming_hll_equals_batch(self, spark, tmp_path):
        from xorfilter_net_spark.sketches.hll import HllSketch

        def make_df(spark, i):
            return spark.range(i * 500, (i + 1) * 500 + 100).selectExpr(
                "cast(id as string) as key"
            )

        sk, state, batch_state = self._stream_parity(
            spark, tmp_path, lambda: HllSketch(p=12, key_col="key"), ["key"], make_df
        )
        assert sk.estimate(state) == sk.estimate(batch_state)

    def test_streaming_bloom_equals_batch(self, spark, tmp_path):
        from xorfilter_net_spark.sketches.bloom import BloomSketch

        def make_df(spark, i):
            return spark.range(i * 300, (i + 1) * 300).selectExpr(
                "concat('k', id) as key"
            )

        sk, state, batch_state = self._stream_parity(
            spark,
            tmp_path,
            lambda: BloomSketch.for_capacity(2000, fpp=0.01, key_col="key"),
            ["key"],
            make_df,
        )
        assert sk.serialize(state) == sk.serialize(batch_state)

    def test_replayed_batch_is_idempotent(self, spark, tmp_path):
        from xorfilter_net_spark.sketches.hll import HllSketch
        from xorfilter_net_spark.streaming.incremental import SketchAccumulator

        sk = HllSketch(p=12, key_col="key")
        acc = SketchAccumulator(sk, str(tmp_path / "state2"))
        df = spark.range(100).selectExpr("cast(id as string) as key")
        acc.merge_batch(df, 0, ["key"])
        s1, m1 = acc.load()
        acc.merge_batch(df, 0, ["key"])  # same micro-batch id replayed
        s2, m2 = acc.load()
        assert sk.serialize(s1) == sk.serialize(s2)
        assert m1["rows"] == m2["rows"] == 100


class TestResize:
    def test_resize_shapes_and_determinism(self, media):
        from xorfilter_net_spark.multimodal.media import resize_media

        r1 = resize_media(media, out_w=8, out_h=8).orderBy("media_id")
        rows = r1.limit(20).collect()
        assert rows, "resize produced no rows"
        for r in rows:
            assert len(bytes(r["pixels"])) == 8 * 8
            assert (r["out_w"], r["out_h"]) == (8, 8)
        # deterministic: a second pass yields identical checksums
        a = {r["media_id"]: r["checksum"] for r in r1.collect()}
        b = {
            r["media_id"]: r["checksum"]
            for r in resize_media(media, out_w=8, out_h=8).collect()
        }
        assert a == b

    def test_resize_matches_direct_numpy(self, media):
        from xorfilter_net_spark.multimodal.media import (
            decode_media,
            resize_media,
        )

        src = media.orderBy("media_id").limit(5).collect()
        got = {
            r["media_id"]: bytes(r["pixels"])
            for r in resize_media(media, out_w=4, out_h=6).collect()
        }
        for r in src:
            px = decode_media(
                bytes(r["payload"]), int(r["width"]), int(r["height"])
            )
            iy = (np.arange(6) * px.shape[0]) // 6
            ix = (np.arange(4) * px.shape[1]) // 4
            assert got[r["media_id"]] == px[np.ix_(iy, ix)].tobytes()
