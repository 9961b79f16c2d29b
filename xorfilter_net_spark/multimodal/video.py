"""Pure-stdlib AVI (rawvideo/DIB) container codec + video kernels.

The video leg of the multimodal family, made REAL in-sandbox like the
PNG (multimodal/png.py) and WAV (multimodal/audio.py) legs: AVI is a
RIFF container, and its uncompressed-DIB payload (``BI_RGB`` — what
``ffmpeg -c:v rawvideo`` emits) is fully decodable with ``struct``
alone. This module walks the real container (LIST hdrl/strl headers,
LIST movi frame chunks, word alignment), reverses the DIB conventions
(bottom-up rows, 4-byte row padding, BGR channel order, 8-bit palette),
and lands every frame as a grayscale uint8 grid — the same pixel
contract as the image codecs, so pHash/resize/feature kernels compose
unchanged on video frames.

Compressed codecs (H.264 etc.) are out of scope for a stdlib decoder
and raise ``NotImplementedError`` loudly with the fourcc; the container
walk itself is codec-agnostic and real either way.

Spark shape: frame sampling and per-frame signatures run in
``mapInPandas`` over Arrow batches — payloads never leave executors,
and a sampled frame (small grid) is the only thing wider than a scalar
that crosses a stage boundary.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .png import _luma

__all__ = [
    "avi_decode_frames",
    "avi_encode_gray",
    "video_frame_sample",
    "video_frame_phashes",
]


def _pad2(n: int) -> int:
    return n + (n & 1)


def avi_decode_frames(payload: bytes) -> list[np.ndarray]:
    """AVI bytes -> list of (h, w) grayscale uint8 frames.

    Accepts BI_RGB uncompressed DIB video streams: 24-bit BGR (luma via
    the same ITU-R 601-2 integer transform as the PNG path), 32-bit
    BGRX, and 8-bit palettized/grayscale."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF/AVI header")

    width = height = bits = None
    compression = None
    palette = None
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, bits, compression, palette
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body_at = pos + 8
            if cid == b"LIST":
                walk(body_at + 4, body_at + clen)  # skip list type tag
            elif cid == b"strf" and width is None:
                (
                    _bisize,
                    w,
                    h,
                    _planes,
                    bc,
                    comp,
                ) = struct.unpack("<IiiHHI", payload[body_at : body_at + 20])
                width, height, bits, compression = w, abs(h), bc, comp
                if bc == 8 and clen >= 40 + 4 * 256:
                    pal = np.frombuffer(
                        payload[body_at + 40 : body_at + 40 + 1024],
                        dtype=np.uint8,
                    ).reshape(256, 4)
                    palette = pal[:, :3][:, ::-1]  # BGRX -> RGB
            elif cid[2:] in (b"db", b"dc") and cid[:2].isdigit():
                frames.append(payload[body_at : body_at + clen])
            pos = body_at + _pad2(clen)

    walk(12, len(payload))
    if width is None:
        raise ValueError("AVI missing strf stream format header")
    if compression not in (0,):  # BI_RGB only
        fourcc = struct.pack("<I", compression)
        raise NotImplementedError(
            f"AVI compressed video stream {fourcc!r} unsupported by the "
            "stdlib codec (rawvideo/BI_RGB only)"
        )
    out: list[np.ndarray] = []
    ch = {8: 1, 24: 3, 32: 4}.get(bits)
    if ch is None:
        raise NotImplementedError(f"AVI {bits}-bit DIB unsupported")
    stride = (width * ch + 3) & ~3  # DIB rows pad to 4 bytes
    for blob in frames:
        if len(blob) < stride * height:
            raise ValueError("AVI frame chunk shorter than one DIB")
        mat = np.frombuffer(blob[: stride * height], dtype=np.uint8)
        mat = mat.reshape(height, stride)[:, : width * ch]
        mat = mat[::-1]  # DIB rows are bottom-up
        if ch == 1:
            if palette is not None:
                out.append(_luma(palette[mat]))
            else:
                out.append(mat.copy())
        else:
            px = mat.reshape(height, width, ch)[..., :3][..., ::-1]
            out.append(_luma(px))  # BGR(X) -> RGB -> luma
    return out


def avi_encode_gray(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """(h, w) uint8 frames -> minimal standard AVI (8-bit DIB video
    stream with an identity grayscale palette, '00db' frame chunks)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape
    stride = (w + 3) & ~3
    pal = b"".join(bytes((i, i, i, 0)) for i in range(256))
    strf = (
        struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, stride * h, 0, 0, 256, 0)
        + pal
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, len(frames),
        stride * h, 0xFFFFFFFF, 0, 0, 0, w, h,
    )
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, stride * h * fps, 0, 0x10, len(frames),
        0, 1, stride * h, w, h, 0, 0, 0, 0,
    )

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(tag: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", tag + body)

    movi = b"".join(
        chunk(
            b"00db",
            b"".join(
                np.ascontiguousarray(f[::-1], dtype=np.uint8)[y].tobytes()
                + b"\x00" * (stride - w)
                for y in range(h)
            ),
        )
        for f in frames
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    body = b"AVI " + hdrl + lst(b"movi", movi)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def video_frame_sample(
    media: DataFrame,
    every: int = 2,
    payload_col: str = "payload",
) -> DataFrame:
    """(media_id, frame_idx, h, w, frame binary) — every ``every``-th
    REAL decoded frame as a grayscale grid (row-major bytes)."""

    def gen(batches):
        for pdf in batches:
            ids, idxs, hs, ws, blobs = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                for i, f in enumerate(avi_decode_frames(bytes(payload))):
                    if i % every:
                        continue
                    ids.append(mid)
                    idxs.append(i)
                    hs.append(f.shape[0])
                    ws.append(f.shape[1])
                    blobs.append(f.tobytes())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "h": hs,
                    "w": ws,
                    "frame": blobs,
                }
            )

    return media.select("media_id", payload_col).mapInPandas(
        gen, schema="media_id long, frame_idx int, h int, w int, frame binary"
    )


def video_frame_phashes(
    media: DataFrame, every: int = 1, payload_col: str = "payload"
) -> DataFrame:
    """(media_id, frame_idx, phash) — per-frame perceptual signatures
    over real decodes; near-duplicate VIDEO detection then reuses the
    image pipeline's banded Hamming join on these rows."""
    from .phash import phash64

    def gen(batches):
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                for i, f in enumerate(avi_decode_frames(bytes(payload))):
                    if i % every:
                        continue
                    v = phash64(f)
                    ids.append(mid)
                    idxs.append(i)
                    # two's-complement fold to int64 for the long column
                    hashes.append(v - (1 << 64) if v >= (1 << 63) else v)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "phash": hashes}
            )

    return media.select("media_id", payload_col).mapInPandas(
        gen, schema="media_id long, frame_idx int, phash long"
    )
