"""Pure-stdlib WAV audio codec + distributed audio kernels.

The audio leg of the multimodal family, made REAL in-sandbox the same
way the PNG leg was (multimodal/png.py): RIFF/WAVE PCM is fully
parseable with ``struct`` alone, so decode, feature extraction, and
frame sampling run on actual encoded audio payloads — no external
codec library, no fake stand-in.

Scope: canonical RIFF/WAVE with PCM (format 1) or IEEE-float (format
3) samples at 8/16/32-bit depths, any channel count; chunks are walked
properly (fmt/data plus arbitrary skippable chunks like LIST). Exotic
containers (ADPCM, WAVE_FORMAT_EXTENSIBLE sub-formats beyond PCM)
raise ``NotImplementedError`` loudly.

Spark shape mirrors the image kernels: payloads live in a binary
column, metadata in typed columns for pushdown pruning; every kernel
is ``mapInPandas`` over Arrow batches; features are integer-quantized
(micro-units) so results are bit-stable across partitionings and
engines — the same exactness convention as the rest of the library.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "wav_decode",
    "wav_encode_pcm16",
    "extract_audio_features",
    "frame_sample_audio",
]


def wav_encode_pcm16(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, ch) int16 -> canonical RIFF/WAVE PCM16 bytes."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n, ch) int16 samples, sample_rate).

    8-bit PCM (unsigned) recenters to signed 16-bit; 32-bit PCM and
    32-bit IEEE float downscale to 16-bit — so every container depth
    lands in one uniform sample dtype for the downstream kernels."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos, end = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, ch, rate, _, _, bits = fmt
    if audio_fmt not in (1, 3):
        raise NotImplementedError(
            f"WAV format {audio_fmt} unsupported (PCM=1 / float=3 only)"
        )
    if audio_fmt == 1 and bits == 16:
        s = np.frombuffer(data, dtype="<i2")
    elif audio_fmt == 1 and bits == 8:
        s = (
            np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
        ) << 8
        s = s.astype(np.int16)
    elif audio_fmt == 1 and bits == 32:
        s = (np.frombuffer(data, dtype="<i4") >> 16).astype(np.int16)
    elif audio_fmt == 3 and bits == 32:
        f = np.frombuffer(data, dtype="<f4").astype(np.float64)
        s = np.clip(np.round(f * 32767.0), -32768, 32767).astype(np.int16)
    else:
        raise NotImplementedError(f"WAV {bits}-bit depth unsupported")
    n = s.size // ch
    return s[: n * ch].reshape(n, ch), rate


def _features_row(payload: bytes) -> dict:
    """Integer-quantized per-clip features from a real decode."""
    s, rate = wav_decode(bytes(payload))
    n, ch = s.shape
    mono = s.astype(np.int64).sum(axis=1) // max(ch, 1)
    if n == 0:
        return dict(
            n_samples=0, rate=rate, channels=ch, duration_ms=0,
            peak=0, rms_e3=0, zcr_e6=0,
        )
    # exact integer accumulations; rms in milli-units of full scale
    sq = int((mono * mono).sum())
    rms = (sq // n) ** 0.5
    signs = mono > 0
    zc = int((signs[1:] != signs[:-1]).sum())
    return dict(
        n_samples=int(n),
        rate=int(rate),
        channels=int(ch),
        duration_ms=int(n * 1000) // int(rate),
        peak=int(np.abs(mono).max()),
        rms_e3=int(rms * 1000 / 32768),
        zcr_e6=int(zc * 1_000_000) // max(n - 1, 1),
    )


def extract_audio_features(
    media: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """(media_id, n_samples, rate, channels, duration_ms, peak, rms_e3,
    zcr_e6) — one real decode per clip inside Arrow batches."""

    def gen(batches):
        for pdf in batches:
            rows = [_features_row(p) for p in pdf[payload_col]]
            out = pd.DataFrame(rows)
            out.insert(0, "media_id", pdf["media_id"].to_numpy())
            yield out

    return media.select("media_id", payload_col).mapInPandas(
        gen,
        schema=(
            "media_id long, n_samples long, rate int, channels int, "
            "duration_ms long, peak long, rms_e3 long, zcr_e6 long"
        ),
    )


def frame_sample_audio(
    media: DataFrame,
    frame_samples: int = 1024,
    stride: int = 1024,
    payload_col: str = "payload",
) -> DataFrame:
    """(media_id, frame_idx, frame binary) — fixed-length mono windows
    from the decoded stream (the audio twin of image frame sampling):
    window w covers samples [w*stride, w*stride + frame_samples), final
    partial window kept (zero-padded is the consumer's call)."""

    def gen(batches):
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                s, _ = wav_decode(bytes(payload))
                mono = (
                    s.astype(np.int64).sum(axis=1) // max(s.shape[1], 1)
                ).astype(np.int16)
                w = 0
                for start in range(0, max(len(mono), 1), stride):
                    chunk = mono[start : start + frame_samples]
                    if len(chunk) == 0:
                        break
                    ids.append(mid)
                    idxs.append(w)
                    blobs.append(chunk.tobytes())
                    w += 1
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": blobs}
            )

    return media.select("media_id", payload_col).mapInPandas(
        gen, schema="media_id long, frame_idx int, frame binary"
    )
