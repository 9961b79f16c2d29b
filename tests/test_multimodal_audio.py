"""Pure-stdlib WAV codec + audio kernels (multimodal/audio.py) — the
real audio decode path executing in-sandbox."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from xorfilter_net_spark.multimodal.audio import (
    extract_audio_features,
    frame_sample_audio,
    wav_decode,
    wav_encode_pcm16,
)


def _rng(seed=0):
    return np.random.default_rng(seed)


def _sig(seed, n=2000, ch=1):
    s = _rng(seed).integers(-32768, 32768, size=(n, ch), dtype=np.int64)
    return s.astype(np.int16)


class TestWavCodec:
    def test_pcm16_roundtrip_mono_and_stereo(self):
        for ch in (1, 2):
            s = _sig(1, ch=ch)
            got, rate = wav_decode(wav_encode_pcm16(s, 22050))
            assert rate == 22050
            assert np.array_equal(got, s.reshape(-1, ch))

    def test_skips_unknown_chunks_and_word_alignment(self):
        s = _sig(2)
        payload = wav_encode_pcm16(s, 8000)
        # splice an odd-length junk chunk between fmt and data
        fmt_end = 12 + 8 + 16
        junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad
        spliced = payload[:fmt_end] + junk + payload[fmt_end:]
        got, rate = wav_decode(spliced)
        assert rate == 8000 and np.array_equal(got, s)

    def test_8bit_recenter(self):
        raw = np.array([0, 128, 255], dtype=np.uint8)
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        payload = (
            b"RIFF" + struct.pack("<I", 4 + 8 + 16 + 8 + 3) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 3) + raw.tobytes()
        )
        got, _ = wav_decode(payload)
        assert got[:, 0].tolist() == [-128 << 8, 0, 127 << 8]

    def test_float32_scaling(self):
        f = np.array([0.0, 0.5, -1.0, 1.0], dtype="<f4")
        fmt = struct.pack("<HHIIHH", 3, 1, 44100, 44100 * 4, 4, 32)
        payload = (
            b"RIFF" + struct.pack("<I", 4 + 8 + 16 + 8 + 16) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 16) + f.tobytes()
        )
        got, _ = wav_decode(payload)
        assert got[:, 0].tolist() == [0, 16384, -32767, 32767]

    def test_not_wav_rejected(self):
        with pytest.raises(ValueError, match="RIFF"):
            wav_decode(b"OggS not a wav")

    def test_adpcm_raises_not_implemented(self):
        fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)
        payload = (
            b"RIFF" + struct.pack("<I", 4 + 8 + 16 + 8) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 0)
        )
        with pytest.raises(NotImplementedError, match="format 2"):
            wav_decode(payload)


class TestSparkKernels:
    def test_features_exact_vs_reference(self, spark):
        import pandas as pd

        sigs = {i: _sig(10 + i, n=1500 + 7 * i) for i in range(4)}
        pdf = pd.DataFrame(
            {
                "media_id": list(sigs),
                "payload": [
                    wav_encode_pcm16(s, 16000) for s in sigs.values()
                ],
            }
        )
        media = spark.createDataFrame(pdf)
        got = {
            r["media_id"]: r
            for r in extract_audio_features(media).collect()
        }
        for i, s in sigs.items():
            mono = s[:, 0].astype(np.int64)
            r = got[i]
            assert r["n_samples"] == len(mono)
            assert r["rate"] == 16000 and r["channels"] == 1
            assert r["duration_ms"] == len(mono) * 1000 // 16000
            assert r["peak"] == int(np.abs(mono).max())
            sq = int((mono * mono).sum())
            assert r["rms_e3"] == int((sq // len(mono)) ** 0.5 * 1000 / 32768)
            signs = mono > 0
            zc = int((signs[1:] != signs[:-1]).sum())
            assert r["zcr_e6"] == zc * 1_000_000 // (len(mono) - 1)

    def test_frame_sampling_covers_stream(self, spark):
        import pandas as pd

        s = _sig(20, n=2500)
        media = spark.createDataFrame(
            pd.DataFrame(
                {"media_id": [7], "payload": [wav_encode_pcm16(s)]}
            )
        )
        frames = sorted(
            (r["frame_idx"], bytes(r["frame"]))
            for r in frame_sample_audio(
                media, frame_samples=1024, stride=1024
            ).collect()
        )
        assert [i for i, _ in frames] == [0, 1, 2]
        rebuilt = b"".join(b for _, b in frames)
        assert rebuilt == s[:, 0].tobytes()  # exact stream coverage
