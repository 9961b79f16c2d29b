"""multimodal/phash.py + last-touch attribution: pure-NumPy pHash
properties, banded-join recall, and registered-query gates/oracle
parity."""

from __future__ import annotations

import numpy as np
import pytest

from xorfilter_net_spark.multimodal.media import decode_media
from xorfilter_net_spark.multimodal.phash import ahash64, phash64


def ham(a, b):
    return bin(int(np.uint64(a) ^ np.uint64(b))).count("1")


def test_phash_identity_and_scale_invariance():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (24, 30), dtype=np.uint8)
    assert phash64(px) == phash64(px)
    # nearest-neighbor upscale preserves the low-frequency structure
    big = px.repeat(2, axis=0).repeat(2, axis=1)
    assert ham(phash64(px), phash64(big)) <= 4


def test_ahash_stability_and_separation():
    from xorfilter_net_spark.multimodal.media import _smooth_field

    sigs = [ahash64(_smooth_field(d)) for d in range(60)]
    # tiny local noise moves the block-mean hash at most a few bits
    for d in range(0, 60, 7):
        px = _smooth_field(d).astype(np.int16)
        px[3, 4] += 3
        px[17, 29] -= 2
        px[9, 9] += 1
        jittered = np.clip(px, 0, 255).astype(np.uint8)
        assert ham(sigs[d], ahash64(jittered)) <= 3
    # distinct smooth fields sit far apart
    nat = [
        ham(sigs[i], sigs[j])
        for i in range(60)
        for j in range(i + 1, 60)
    ]
    assert min(nat) > 3


def test_phash_unstable_on_sparse_spectra_documented():
    """Why aHash is the default: on SPARSE-spectrum fields (a pure
    two-sinusoid image) the DCT-median threshold sits among near-zero
    coefficients, and tiny noise flips many bits — the docstring's
    claim. The library corpus avoids this regime by construction."""

    def sparse(doc, w=32, h=32):
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        fa = (doc * 2654435761 % 997) / 997.0 * 2 * np.pi
        g = 128 + 55 * np.sin(2 * np.pi * (1 + doc % 3) * x / w + fa) * np.cos(
            2 * np.pi * (1 + (doc // 3) % 3) * y / h
        )
        return np.clip(g, 0, 255).astype(np.uint8)

    worst = 0
    for d in range(0, 40, 3):
        px = sparse(d).astype(np.int16)
        for k in range(6):
            px[(7 * k) % 32, (11 * k) % 32] += (k % 5) - 2
        j = np.clip(px, 0, 255).astype(np.uint8)
        worst = max(worst, ham(phash64(sparse(d)), phash64(j)))
    assert worst > 3  # exceeds the exact-recall band aHash stays inside


def test_smooth_codec_locality():
    p1 = b"abcdefgh" * 16
    p2 = b"Xbcdefgh" * 16
    g1 = decode_media(p1, 32, 32, codec="fake_smooth")
    g2 = decode_media(p2, 32, 32, codec="fake_smooth")
    assert (g1 != g2).mean() < 0.2  # few pixels changed
    # the changed pixels keep their VALUES close (locality), unlike the
    # mixing codec where every touched pixel jumps arbitrarily
    touched = g1 != g2
    assert np.abs(
        g1[touched].astype(int) - g2[touched].astype(int)
    ).max() < 64
    a1 = decode_media(p1, 32, 32, codec="fake")
    a2 = decode_media(p2, 32, 32, codec="fake")
    t2 = a1 != a2
    assert np.abs(a1[t2].astype(int) - a2[t2].astype(int)).max() > 64


def test_banded_pairs_recall_and_exactness(spark):
    from xorfilter_net_spark.dedup.simhash import banded_hamming_pairs

    rng = np.random.default_rng(6)
    base = rng.integers(0, 2**63, 20, dtype=np.int64)
    rows = [(i, int(s)) for i, s in enumerate(base)]
    # plant pairs at distances 1..3 (exact-recall band for bands=4)
    for k, d in enumerate((1, 2, 3)):
        sig = np.uint64(base[k])
        for bit in range(d):
            sig ^= np.uint64(1) << np.uint64(bit * 17)
        rows.append((100 + k, int(np.int64(sig))))
    df = spark.createDataFrame(rows, "id long, sig long")
    got = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in banded_hamming_pairs(df, "id", "sig", 3, 4).collect()
    }
    for k, d in enumerate((1, 2, 3)):
        assert got[(k, 100 + k)] == d


def test_attribution_query_matches_duckdb(spark, sf_tiny):
    import duckdb

    from xorfilter_net_spark import entrypoints

    got = sorted(
        tuple(r)
        for r in entrypoints.QUERIES["q_attribution_last_touch"](
            spark, sf_tiny
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "create view events as select * from "
        f"read_parquet('{sf_tiny}/events.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            entrypoints.ORACLES["q_attribution_last_touch"]
        ).fetchall()
    )
    assert got == want
    # non-vacuous: some purchases attributed, some not
    flags = {t[-1] for t in got}
    assert flags == {True, False}


def test_phash_media_gates(spark, sf_tiny):
    from xorfilter_net_spark import entrypoints

    rows = entrypoints.QUERIES["phash_near_dup_media"](
        spark, sf_tiny
    ).collect()
    assert rows and all(r["recalled"] for r in rows)
    assert all(r["within_band"] for r in rows)
    assert all(r["naturals_separated"] for r in rows)
    # per-pair contract: every planted id pair, no spurious extras
    assert all(r["id_b"] == r["id_a"] + 1000000 for r in rows)
