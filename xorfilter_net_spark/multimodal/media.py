"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Spark-side plumbing for image/audio/video-style data at 100 TB: payloads
live in a ``binary`` column (parquet BYTE_ARRAY — column-pruned away
unless selected), metadata in plain typed columns so predicate pushdown
prunes files *before* any payload byte is read. All payload processing
runs in ``mapInPandas`` over Arrow batches.

Codec status: the IMAGE and AUDIO decode paths are REAL in-sandbox —
``codec='png'`` is a complete pure-stdlib PNG implementation
(multimodal/png.py) and the WAV kernels decode actual RIFF/WAVE
payloads (multimodal/audio.py); ``codec='pil'`` covers every other
image format where Pillow exists. The deterministic fake codecs remain
for synthetic-payload queries whose DuckDB oracles must see identical
"pixels" (the fakes are engine-replayable; real decodes are gated by
the in-query boolean gates ``media_png_codec_ok`` /
``media_wav_codec_ok`` / ``media_avi_codec_ok`` instead). The video
leg is real at the CONTAINER level too — multimodal/video.py walks
actual AVI rawvideo/DIB streams into per-frame grids (compressed
codecs like H.264 are the remaining, loudly-gated plug point).

The synthetic media table derives from ``documents`` with engine-portable
SQL (Spark + DuckDB), so oracle queries see the identical table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..text.fingerprint import splitmix64

# media table derivation (portable: runs verbatim in Spark SQL and DuckDB
# except for the string->blob cast, handled per dialect)
_PAYLOAD = {
    "spark": "cast(repeat(md5(text), 1 + cast(doc_id % 4 as int)) as binary)",
    "duckdb": "encode(repeat(md5(text), 1 + cast(doc_id % 4 as int)))",
}
_META = (
    "case cast(doc_id % 3 as int) when 0 then 'image/png' "
    "when 1 then 'audio/wav' else 'video/mp4' end as media_type, "
    "cast(16 + doc_id % 17 as int) as width, "
    "cast(16 + doc_id % 13 as int) as height, "
    "cast(1 + doc_id % 5 as int) as n_frames"
)


def media_select(dialect: str) -> str:
    return (
        f"select doc_id as media_id, {_PAYLOAD[dialect]} as payload, {_META} "
        "from documents"
    )


def media_table(spark: SparkSession, docs: DataFrame) -> DataFrame:
    docs.createOrReplaceTempView("documents")
    return spark.sql(media_select("spark"))


def _fake_pixels(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic (height, width) uint8 array from payload bytes —
    stand-in for a real codec, cheap and collision-resistant."""
    need = width * height
    raw = np.frombuffer(payload, dtype=np.uint8)
    if raw.size == 0:
        raw = np.zeros(1, dtype=np.uint8)
    reps = -(-need // raw.size)
    tiled = np.tile(raw, reps)[:need].astype(np.uint64)
    mixed = splitmix64(tiled + np.arange(need, dtype=np.uint64))
    return (mixed & np.uint64(0xFF)).astype(np.uint8).reshape(height, width)


def _fake_pixels_smooth(payload: bytes, width: int, height: int) -> np.ndarray:
    """Locality-preserving fake codec: pixels are the payload bytes tiled
    verbatim (no mixing), so a small payload change perturbs few pixels —
    the stand-in that lets NEAR-duplicate detection (perceptual hashing)
    be exercised end to end. The avalanche codec above is the right
    stand-in for exact-content work; this one for similarity work."""
    need = width * height
    raw = np.frombuffer(payload, dtype=np.uint8)
    if raw.size == 0:
        raw = np.zeros(1, dtype=np.uint8)
    reps = -(-need // raw.size)
    return np.tile(raw, reps)[:need].reshape(height, width).copy()


def pil_available() -> bool:
    """True when Pillow is importable — gates the real-codec path."""
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _pil_pixels(payload: bytes) -> np.ndarray:
    """Real decode via Pillow: payload is an actual encoded image
    (PNG/JPEG/...); returns the grayscale pixel grid at the image's OWN
    dimensions — with a real codec the container is authoritative and
    the table's width/height metadata is advisory (used for pruning,
    not decoding)."""
    from io import BytesIO

    from PIL import Image

    with Image.open(BytesIO(payload)) as im:
        return np.asarray(im.convert("L"), dtype=np.uint8)


def decode_media(
    payload: bytes, width: int, height: int, codec: str = "fake"
) -> np.ndarray:
    if codec == "fake":
        return _fake_pixels(payload, width, height)
    if codec == "fake_smooth":
        return _fake_pixels_smooth(payload, width, height)
    if codec == "png":
        # REAL decode, pure stdlib (multimodal/png.py): full PNG spec
        # decode path — chunk+CRC parse, inflate, un-filter, sample
        # expansion, PIL-parity luma. The container is authoritative
        # (width/height metadata advisory), same contract as 'pil'.
        from .png import png_decode

        return png_decode(payload)
    if codec == "pil":
        if not pil_available():
            raise NotImplementedError(
                "codec='pil' requires Pillow, which is not installed in "
                "this environment; codec='png' is the stdlib real-decode "
                "path for PNG payloads, and the deterministic fake "
                "codecs cover the Spark-side plumbing for the rest"
            )
        return _pil_pixels(payload)
    raise NotImplementedError(
        f"unknown codec {codec!r}: 'fake'/'fake_smooth' (deterministic "
        "stand-ins), 'png' (stdlib real PNG decode) and 'pil' (real "
        "image decode via Pillow, any format) are supported; plug other "
        "codec libraries in here"
    )


def extract_features(
    media: DataFrame,
    payload_col: str = "payload",
    codec: str = "fake",
) -> DataFrame:
    """(media_id, media_type, feat array<double>) — mean/std/min/max/
    edge-energy of the decoded pixel grid, one Arrow batch at a time."""

    def gen(batches):
        for pdf in batches:
            feats = []
            for payload, w, h in zip(
                pdf[payload_col], pdf["width"], pdf["height"]
            ):
                px = decode_media(bytes(payload), int(w), int(h), codec)
                d = px.astype(np.float64)
                grad = np.abs(np.diff(d, axis=1)).mean() if w > 1 else 0.0
                feats.append(
                    [d.mean(), d.std(), float(d.min()), float(d.max()), grad]
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "feat": feats,
                }
            )

    return media.select(
        "media_id", "media_type", payload_col, "width", "height"
    ).mapInPandas(
        gen, schema="media_id long, media_type string, feat array<double>"
    )


def sample_frames(
    media: DataFrame, payload_col: str = "payload", stride: int = 2
) -> DataFrame:
    """Treat the payload as ``n_frames`` equal chunks ("video frames");
    emit every ``stride``-th frame as its own row — the frame-sampling
    shape for video pipelines (explode stays executor-side; payload bytes
    are sliced per batch, never collected)."""

    def gen(batches):
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload, nf in zip(
                pdf["media_id"], pdf[payload_col], pdf["n_frames"]
            ):
                b = bytes(payload)
                nf = max(int(nf), 1)
                flen = max(len(b) // nf, 1)
                for fi in range(0, nf, stride):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(b[fi * flen : (fi + 1) * flen])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.select("media_id", payload_col, "n_frames").mapInPandas(
        gen, schema="media_id long, frame_idx int, frame binary"
    )


def resize_nearest(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample of a 2-D pixel grid (pure index
    gather, codec-independent)."""
    iy = (np.arange(out_h) * px.shape[0]) // out_h
    ix = (np.arange(out_w) * px.shape[1]) // out_w
    return px[np.ix_(iy, ix)]


def resize_media(
    media: DataFrame,
    out_w: int = 8,
    out_h: int = 8,
    payload_col: str = "payload",
    codec: str = "fake",
) -> DataFrame:
    """Nearest-neighbor resize of every decoded pixel grid to
    (out_h, out_w) — the thumbnail/normalization step of an image
    pipeline. The resample itself is real (pure NumPy index gather, no
    codec dependence); only the decode behind it is the pluggable stub.
    Emits the resized grid as bytes plus a deterministic checksum so
    tests can pin batch-shape and value stability end to end."""

    def gen(batches):
        for pdf in batches:
            ids, types, blobs, sums = [], [], [], []
            for mid, mtype, payload, w, h in zip(
                pdf["media_id"],
                pdf["media_type"],
                pdf[payload_col],
                pdf["width"],
                pdf["height"],
            ):
                px = decode_media(bytes(payload), int(w), int(h), codec)
                small = resize_nearest(px, out_w, out_h)
                ids.append(mid)
                types.append(mtype)
                blobs.append(small.tobytes())
                # order-sensitive checksum: position-mixed so permuted
                # pixel grids do not collide
                vals = small.reshape(-1).astype(np.uint64)
                pos = np.arange(vals.size, dtype=np.uint64)
                sums.append(
                    int(splitmix64(vals * np.uint64(31) + pos).sum()
                        & np.uint64(0x7FFFFFFFFFFFFFFF))
                )
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": types,
                    "out_w": out_w,
                    "out_h": out_h,
                    "pixels": blobs,
                    "checksum": sums,
                }
            )

    return media.select(
        "media_id", "media_type", payload_col, "width", "height"
    ).mapInPandas(
        gen,
        schema=(
            "media_id long, media_type string, out_w int, out_h int, "
            "pixels binary, checksum long"
        ),
    )


def _smooth_field(doc: int, w: int = 32, h: int = 32) -> np.ndarray:
    """Deterministic 'image' for a doc id: a doc-unique 8x8 block-sign
    pattern (64 bits of splitmix64 -> ±45 gray levels, the dominant
    structure) over a mild doc-phased sinusoid texture. Two distinct
    docs differ in ~32 of 64 blocks — far apart under any perceptual
    hash — while small pixel jitter cannot flip a ±45-margin block.
    (A purely parametric smooth family is the wrong corpus here: with
    hundreds of docs, birthday-close phases produce GENUINELY similar
    images — measured natural aHash distances down to 10 and pair
    explosions. Unique block signs make separation deterministic.)"""
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    base = np.uint64((doc * 0x9E3779B97F4A7C15 + 0x5851F42D) & (2**64 - 1))
    bits = splitmix64(base + np.arange(64, dtype=np.uint64)) & np.uint64(1)
    signs = (bits.astype(np.float64) * 2 - 1).reshape(8, 8) * 45.0
    blocks = np.kron(signs, np.ones((h // 8, w // 8)))
    fa = float(splitmix64(base ^ np.uint64(7)) % np.uint64(628)) / 100.0
    fb = float(splitmix64(base ^ np.uint64(11)) % np.uint64(628)) / 100.0
    texture = 15 * np.sin(2 * np.pi * x / w + fa) * np.cos(
        2 * np.pi * y / h + fb
    )
    g = 128 + blocks + texture
    return np.clip(g, 0, 255).astype(np.uint8)


def smooth_media_table(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(media_id, payload, media_type, width, height, n_frames) — one
    32x32 smooth grid per doc id; payload length == grid size, so the
    ``fake_smooth`` codec decodes it verbatim (no tiling)."""

    def gen(batches):
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [
                        _smooth_field(int(d)).tobytes() for d in ids
                    ],
                    "media_type": ["image/png"] * len(ids),
                    "width": np.full(len(ids), 32, dtype=np.int32),
                    "height": np.full(len(ids), 32, dtype=np.int32),
                    "n_frames": np.ones(len(ids), dtype=np.int32),
                }
            )

    return docs.select(id_col).mapInPandas(
        gen,
        schema=(
            "media_id long, payload binary, media_type string, "
            "width int, height int, n_frames int"
        ),
    )


def jitter_payloads(
    media: DataFrame,
    id_offset: int = 1_000_000,
    n_points: int = 6,
    max_delta: int = 3,
    payload_col: str = "payload",
) -> DataFrame:
    """Deterministic tiny-noise variants (the 'same photo, re-encoded'
    stand-in): ``n_points`` pixels perturbed by at most ``max_delta``
    levels, positions/deltas derived from splitmix64(media_id) — no RNG,
    rebuild-stable. Returned rows carry ``media_id + id_offset``."""

    def gen(batches):
        for pdf in batches:
            out_ids, blobs = [], []
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf[payload_col], pdf["width"], pdf["height"]
            ):
                px = decode_media(
                    bytes(payload), int(w), int(h), "fake_smooth"
                ).astype(np.int16)
                base = np.uint64(
                    (int(mid) * 0x9E3779B97F4A7C15) & (2**64 - 1)
                )
                seq = splitmix64(base + np.arange(3 * n_points, dtype=np.uint64))
                ys = (seq[0::3] % np.uint64(px.shape[0])).astype(int)
                xs = (seq[1::3] % np.uint64(px.shape[1])).astype(int)
                deltas = (
                    seq[2::3] % np.uint64(2 * max_delta + 1)
                ).astype(int) - max_delta
                px[ys, xs] += deltas
                out_ids.append(int(mid) + id_offset)
                blobs.append(
                    np.clip(px, 0, 255).astype(np.uint8).tobytes()
                )
            yield pd.DataFrame(
                {
                    "media_id": out_ids,
                    "payload": blobs,
                    "media_type": pdf["media_type"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "n_frames": pdf["n_frames"],
                }
            )

    return media.select(
        "media_id", payload_col, "media_type", "width", "height", "n_frames"
    ).mapInPandas(
        gen,
        schema=(
            "media_id long, payload binary, media_type string, "
            "width int, height int, n_frames int"
        ),
    )
