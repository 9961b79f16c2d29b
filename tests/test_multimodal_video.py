"""Pure-stdlib AVI rawvideo codec + video kernels (multimodal/video.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from xorfilter_net_spark.multimodal.video import (
    avi_decode_frames,
    avi_encode_gray,
    video_frame_phashes,
    video_frame_sample,
)


def _rng(seed=0):
    return np.random.default_rng(seed)


def _frames(seed, n=5, h=16, w=20):
    return [
        _rng(seed * 100 + i).integers(0, 256, size=(h, w), dtype=np.uint8)
        for i in range(n)
    ]


def _luma_ref(rgb):
    r = rgb[..., 0].astype(np.int64)
    g = rgb[..., 1].astype(np.int64)
    b = rgb[..., 2].astype(np.int64)
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(np.uint8)


class TestAviCodec:
    def test_gray_roundtrip_with_row_padding(self):
        # w=20 -> stride 20 (already 4-aligned); w=17 -> stride 20 (pad)
        for w in (20, 17):
            frames = _frames(1, h=7, w=w)
            got = avi_decode_frames(avi_encode_gray(frames))
            assert len(got) == len(frames)
            for a, b in zip(got, frames):
                assert np.array_equal(a, b)

    def test_24bit_bgr_frames(self):
        """Hand-built 24-bit BI_RGB AVI: decoder must un-pad, un-flip,
        and convert BGR to the exact integer luma."""
        h, w = 3, 3  # stride = 12 -> 4-aligned with 3 pad bytes
        rgb = _rng(2).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        bgr = rgb[..., ::-1]
        stride = (w * 3 + 3) & ~3
        rows = b"".join(
            bgr[::-1][y].tobytes() + b"\x00" * (stride - w * 3)
            for y in range(h)
        )
        strf = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0
        )
        avih = struct.pack("<" + "I" * 14, *([0] * 14))
        strh = struct.pack(
            "<4s4sIHHIIIIIIIIhhhh",
            b"vids", b"DIB ", 0, 0, 0, 0, 1, 10, 0, 1,
            stride * h, 0xFFFFFFFF, 0, 0, 0, w, h,
        )

        def chunk(cid, body):
            return cid + struct.pack("<I", len(body)) + body + (
                b"\x00" if len(body) & 1 else b""
            )

        def lst(tag, body):
            return chunk(b"LIST", tag + body)

        body = (
            b"AVI "
            + lst(
                b"hdrl",
                chunk(b"avih", avih)
                + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
            )
            + lst(b"movi", chunk(b"00db", rows))
        )
        payload = b"RIFF" + struct.pack("<I", len(body)) + body
        got = avi_decode_frames(payload)
        assert len(got) == 1
        assert np.array_equal(got[0], _luma_ref(rgb))

    def test_compressed_stream_raises(self):
        frames = _frames(3, n=1)
        payload = bytearray(avi_encode_gray(frames))
        # flip biCompression (offset: find strf chunk body + 16)
        at = payload.index(b"strf") + 8 + 16
        payload[at : at + 4] = b"h264"
        with pytest.raises(NotImplementedError, match="unsupported"):
            avi_decode_frames(bytes(payload))

    def test_not_avi_rejected(self):
        with pytest.raises(ValueError, match="RIFF/AVI"):
            avi_decode_frames(b"RIFF\x00\x00\x00\x00WAVE")


class TestSparkKernels:
    def test_frame_sample_every_2nd(self, spark):
        import pandas as pd

        frames = _frames(4, n=6)
        media = spark.createDataFrame(
            pd.DataFrame(
                {"media_id": [1], "payload": [avi_encode_gray(frames)]}
            )
        )
        got = {
            r["frame_idx"]: (r["h"], r["w"], bytes(r["frame"]))
            for r in video_frame_sample(media, every=2).collect()
        }
        assert sorted(got) == [0, 2, 4]
        for i in (0, 2, 4):
            h, w, blob = got[i]
            assert (h, w) == frames[i].shape
            assert blob == frames[i].tobytes()

    def test_frame_phashes_detect_near_dup_video(self, spark):
        import pandas as pd

        from xorfilter_net_spark.multimodal.phash import phash64

        base = _frames(5, n=4, h=32, w=32)
        near = [f.copy() for f in base]
        near[0][0, 0] ^= 1
        far = _frames(99, n=4, h=32, w=32)
        media = spark.createDataFrame(
            pd.DataFrame(
                {
                    "media_id": [1, 2, 3],
                    "payload": [
                        avi_encode_gray(x) for x in (base, near, far)
                    ],
                }
            )
        )
        rows = video_frame_phashes(media).collect()
        ph = {(r["media_id"], r["frame_idx"]): int(r["phash"]) for r in rows}
        assert len(ph) == 12
        # distributed hash == direct hash on the source frame
        want = phash64(base[1])
        want = want - (1 << 64) if want >= (1 << 63) else want
        assert ph[(1, 1)] == want
        d_near = sum(
            bin((ph[(1, i)] ^ ph[(2, i)]) & ((1 << 64) - 1)).count("1")
            for i in range(4)
        )
        d_far = sum(
            bin((ph[(1, i)] ^ ph[(3, i)]) & ((1 << 64) - 1)).count("1")
            for i in range(4)
        )
        assert d_near < d_far
