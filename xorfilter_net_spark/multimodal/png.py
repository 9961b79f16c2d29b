"""Pure-stdlib PNG codec — the in-sandbox REAL decode path.

The multimodal family's real-codec plug point (`decode_media(codec=
'pil')`) is gated on Pillow, which this environment does not ship; the
deterministic fake codecs covered the Spark-side plumbing but the real
decode had never executed here. This module closes that gap for PNG —
a complete, dependency-free implementation of the PNG spec's decode
path (RFC 2083 / W3C PNG): chunk parsing, zlib inflate, scanline
un-filtering (None/Sub/Up/Average/Paeth), and sample expansion for the
standard color types, plus PIL-parity grayscale conversion (the ITU-R
601-2 integer luma transform Pillow uses for ``convert("L")``), so
``decode_media(codec='png')`` is byte-identical to the Pillow path on
PNG inputs wherever both exist (asserted by a skipif-gated test).

A minimal encoder (filter-0 scanlines, one IDAT) is included so tests
can fabricate REAL PNG payloads without any imaging library; the
decoder accepts any conformant non-interlaced 8-bit-depth PNG, not just
this encoder's output.

Scope: bit depths 1/2/4/8/16, color types 0 (gray), 2 (RGB), 3
(palette), 4 (gray+alpha), 6 (RGBA), non-interlaced AND Adam7
interlaced (each of the 7 passes is an independently-filtered
sub-image scattered back onto the pixel grid). 16-bit samples reduce
to their high byte — the exact ``v >> 8`` reduction Pillow applies
when decoding 16-bit truecolor to 8-bit channels; for 16-bit
grayscale Pillow keeps mode I;16, so the Pillow-parity claim covers
8-bit-channel outputs only and the 16-bit reduction is pinned by this
module's own round-trip tests.

Spark-side usage is unchanged: the codec runs inside the same
``mapInPandas`` Arrow kernels (`extract_features`, `resize_media`,
pHash) — this module is executor-local NumPy, no driver state.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "png_decode",
    "png_encode_gray",
    "png_encode_rgb",
    "png_encode_gray16",
    "png_encode_gray_adam7",
]

_SIG = b"\x89PNG\r\n\x1a\n"

# samples per pixel by PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass grid: (x_start, y_start, x_step, y_step), spec order
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _chunks(payload: bytes):
    if payload[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        # CRC covers type+data; verify so corrupt payloads fail loudly
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, width: int, height: int, bpp: int, stride: int):
    """Reverse per-scanline filtering -> (height, stride) uint8 matrix.
    Filters None/Sub/Up vectorize (Sub is a mod-256 prefix sum per
    bpp-lane); Average/Paeth are inherently sequential per pixel and run
    in Python — fine at Arrow-batch scale, and rows mix freely."""
    if len(raw) != height * (1 + stride):
        raise ValueError("PNG data length does not match dimensions")
    mat = np.zeros((height, stride), dtype=np.uint8)
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, 1 + stride)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = int(rows[y, 0])
        line = rows[y, 1:].copy()
        if ftype == 0:
            out = line
        elif ftype == 1:  # Sub: prefix sum mod 256 within each bpp lane
            out = line
            lanes = out.reshape(-1, bpp) if stride % bpp == 0 else None
            if lanes is not None:
                out = (
                    np.cumsum(lanes.astype(np.int64), axis=0) & 0xFF
                ).astype(np.uint8).reshape(stride)
            else:  # ragged stride (sub-byte depths): sequential
                for i in range(bpp, stride):
                    out[i] = (out[i] + out[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            out = (line.astype(np.int64) + prev) .astype(np.int64)
            out = (out & 0xFF).astype(np.uint8)
        elif ftype == 3:  # Average
            out = line
            for i in range(stride):
                left = int(out[i - bpp]) if i >= bpp else 0
                out[i] = (int(out[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            out = line
            for i in range(stride):
                left = int(out[i - bpp]) if i >= bpp else 0
                ul = int(prev[i - bpp]) if i >= bpp else 0
                out[i] = (int(out[i]) + _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype} invalid")
        mat[y] = out
        prev = mat[y]
    return mat


def _expand_bits(row: np.ndarray, depth: int, n: int) -> np.ndarray:
    """Unpack sub-byte samples (depths 1/2/4) to one sample per entry."""
    if depth == 8:
        return row[:n]
    per = 8 // depth
    shifts = np.arange(per - 1, -1, -1) * depth
    mask = (1 << depth) - 1
    samples = (row[:, None].astype(np.uint16) >> shifts) & mask
    return samples.reshape(-1)[:n].astype(np.uint8)


def _luma(rgb: np.ndarray) -> np.ndarray:
    """Pillow's convert('L') integer transform (ITU-R 601-2):
    L = (R*19595 + G*38470 + B*7471 + 0x8000) >> 16."""
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(
        np.uint8
    )


def _rows_to_samples(
    mat: np.ndarray, width: int, depth: int, ch: int
) -> np.ndarray:
    """Filtered-byte matrix (h, stride) -> (h, width, ch) uint8 samples.
    16-bit samples reduce to their high (big-endian first) byte, the
    v >> 8 reduction; sub-byte depths unpack to one sample per entry
    (unscaled — gray scaling happens at the call site)."""
    h = mat.shape[0]
    if depth == 16:
        return mat.reshape(h, width, ch, 2)[..., 0].copy()
    out = np.empty((h, width * ch), dtype=np.uint8)
    for y in range(h):
        out[y] = _expand_bits(mat[y], depth, width * ch)
    return out.reshape(h, width, ch)


def png_decode(payload: bytes) -> np.ndarray:
    """Decode a PNG byte payload to a grayscale uint8 grid at the
    image's own dimensions (the container is authoritative — same
    contract as the Pillow path)."""
    ihdr = None
    plte = None
    idat = bytearray()
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, ctype_, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("PNG nonstandard compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"PNG interlace method {interlace} invalid")
    if ctype_ not in _CHANNELS:
        raise ValueError(f"PNG color type {ctype_} invalid")
    if ctype_ not in (0, 3) and depth not in (8, 16):
        raise ValueError("sub-byte depth only valid for gray/palette")
    if ctype_ == 3 and depth == 16:
        raise ValueError("palette PNG cannot be 16-bit")
    ch = _CHANNELS[ctype_]
    bits_per_px = depth * ch
    bpp = max(1, bits_per_px // 8)
    raw = zlib.decompress(bytes(idat))

    if interlace == 0:
        stride = (width * bits_per_px + 7) // 8
        mat = _unfilter(raw, width, height, bpp, stride)
        samples = _rows_to_samples(mat, width, depth, ch)
    else:  # Adam7: 7 independently-filtered sub-images, scattered back
        samples = np.zeros((height, width, ch), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue  # empty pass: wholly absent, no filter bytes
            stride_p = (pw * bits_per_px + 7) // 8
            need = ph * (1 + stride_p)
            sub = raw[pos : pos + need]
            pos += need
            m = _unfilter(sub, pw, ph, bpp, stride_p)
            samples[y0::dy, x0::dx] = _rows_to_samples(m, pw, depth, ch)
        if pos != len(raw):
            raise ValueError("Adam7 PNG data length mismatch")

    if ctype_ == 0:  # grayscale
        scale = 255 // ((1 << depth) - 1) if depth < 8 else 1
        return (samples[..., 0] * np.uint8(scale)).astype(np.uint8)
    if ctype_ == 3:  # palette -> RGB -> luma
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return _luma(plte[samples[..., 0]])
    if ctype_ == 4:  # gray+alpha: Pillow's L-convert drops alpha
        return samples[..., 0].copy()
    return _luma(samples[..., :3])  # RGB / RGBA (alpha dropped, as Pillow)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _encode(px: np.ndarray, color_type: int) -> bytes:
    h, w = px.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    body = px.reshape(h, -1)
    raw = b"".join(b"\x00" + body[y].tobytes() for y in range(h))
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )


def png_encode_gray(px: np.ndarray) -> bytes:
    """(h, w) uint8 -> PNG bytes (8-bit grayscale, filter 0)."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim != 2:
        raise ValueError("gray encoder expects a 2-D array")
    return _encode(px, 0)


def png_encode_rgb(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> PNG bytes (8-bit truecolor, filter 0)."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("rgb encoder expects an (h, w, 3) array")
    return _encode(px, 2)


def png_encode_gray16(px: np.ndarray) -> bytes:
    """(h, w) uint16 -> PNG bytes (16-bit grayscale, filter 0,
    big-endian samples) — fabricates REAL 16-bit payloads for the
    decoder tests without any imaging library."""
    px = np.ascontiguousarray(px, dtype=np.uint16)
    if px.ndim != 2:
        raise ValueError("gray16 encoder expects a 2-D array")
    h, w = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    be = px.astype(">u2")
    raw = b"".join(b"\x00" + be[y].tobytes() for y in range(h))
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )


def png_encode_gray_adam7(px: np.ndarray) -> bytes:
    """(h, w) uint8 -> Adam7-interlaced PNG bytes (8-bit grayscale,
    filter 0 on every pass scanline; empty passes wholly absent per
    spec)."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim != 2:
        raise ValueError("gray encoder expects a 2-D array")
    h, w = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1)
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = px[y0::dy, x0::dx]
        if sub.shape[0] <= 0 or sub.shape[1] <= 0:
            continue
        for row in sub:
            raw += b"\x00" + row.tobytes()
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + _chunk(b"IEND", b"")
    )
