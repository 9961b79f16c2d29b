"""Real-codec (Pillow) path for the multimodal kernels.

The deterministic fake codecs validate all the Spark-side plumbing and
hash/resize math; this module runs the SAME math on at least one real
decode when the environment provides a codec library (VERDICT r01
item 6). Skipped cleanly where Pillow is absent — the fake path is
unchanged either way.
"""

from __future__ import annotations

import numpy as np
import pytest

from xorfilter_net_spark.multimodal.media import decode_media, pil_available

pytestmark = pytest.mark.skipif(
    not pil_available(), reason="Pillow not installed (sandbox has no codecs)"
)


def _png_bytes(px: np.ndarray) -> bytes:
    from io import BytesIO

    from PIL import Image

    buf = BytesIO()
    Image.fromarray(px, mode="L").save(buf, format="PNG")
    return buf.getvalue()


def _grid(h: int, w: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    # smooth-ish gradient + noise: a realistic spectrum, unlike the
    # sparse-spectrum synthetic grids the fake codec produces
    y, x = np.mgrid[0:h, 0:w]
    base = (x * 255 / max(w - 1, 1) + y * 64 / max(h - 1, 1)) / 1.25
    return np.clip(base + rng.normal(0, 12, (h, w)), 0, 255).astype(np.uint8)


def test_pil_decode_roundtrips_grid():
    px = _grid(24, 32)
    out = decode_media(_png_bytes(px), 32, 24, codec="pil")
    assert out.shape == (24, 32)
    assert np.array_equal(out, px)  # PNG is lossless; L-mode identity


def test_phash_on_real_decode_separates_jitter_from_unrelated():
    from xorfilter_net_spark.multimodal.phash import phash64

    px = _grid(32, 32, seed=1)
    jit = px.copy()
    jit[5, 7] = np.uint8((int(jit[5, 7]) + 9) % 256)  # tiny local edit
    other = _grid(32, 32, seed=99)

    h = phash64(decode_media(_png_bytes(px), 32, 32, codec="pil"))
    hj = phash64(decode_media(_png_bytes(jit), 32, 32, codec="pil"))
    ho = phash64(decode_media(_png_bytes(other), 32, 32, codec="pil"))
    d = lambda a, b: bin(a ^ b).count("1")
    assert d(h, hj) <= 6  # near-dup stays close on a real spectrum
    assert d(h, ho) > 6  # unrelated content stays far


def test_resize_math_on_real_decode_is_deterministic():
    from xorfilter_net_spark.multimodal.media import resize_nearest

    px = decode_media(_png_bytes(_grid(20, 30)), 30, 20, codec="pil")
    a = resize_nearest(px, 8, 8)
    b = resize_nearest(px, 8, 8)
    assert a.shape == (8, 8)
    assert np.array_equal(a, b)
