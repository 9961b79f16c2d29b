"""Cuckoo filter (filters/cuckoo.py): the deletable member of the
reference paper's comparison triad (README.md:18 citing arXiv:1912.08258
"Faster and Smaller Than Bloom and Cuckoo Filters"; CoNEXT'14 contracts).
"""

import numpy as np
import pytest

from xorfilter_net_spark.filters.cuckoo import (
    BUCKET_SLOTS,
    CuckooFilter,
    build_cuckoo_from_bytes,
    build_cuckoo_from_digests,
)

RNG = np.random.default_rng(20260819)


def _digests(n, seed=1):
    r = np.random.default_rng(seed)
    d0 = r.integers(0, 2**63, n, dtype=np.int64).view(np.uint64)
    d1 = r.integers(0, 2**63, n, dtype=np.int64).view(np.uint64)
    return d0, d1


class TestCuckooCore:
    def test_zero_fn_and_fpr_bound(self):
        d0, d1 = _digests(100_000, seed=2)
        f = build_cuckoo_from_digests(d0, d1)
        assert f.contains_digests(d0, d1).all()  # no false negatives, ever
        n0, n1 = _digests(100_000, seed=3)
        fpr = f.contains_digests(n0, n1).mean()
        assert fpr < 3 * f.fpr_bound()  # CoNEXT'14 §3.1: 2b/2^f

    def test_high_load_placement(self):
        # exactly the published 0.95 load for b=4 — the walk must converge
        m = 8192
        n = int(m * BUCKET_SLOTS * 0.95)
        d0, d1 = _digests(n, seed=4)
        f = build_cuckoo_from_digests(d0, d1, m=m)
        assert f.load_factor == pytest.approx(0.95, abs=0.001)
        assert f.contains_digests(d0, d1).all()

    def test_delete_semantics(self):
        d0, d1 = _digests(50_000, seed=5)
        f = build_cuckoo_from_digests(d0, d1)
        f.delete_digests(d0[::4], d1[::4])
        keep = np.ones(d0.shape[0], bool)
        keep[::4] = False
        # survivors all found; deleted genuinely gone (hit rate ~ FPR)
        assert f.contains_digests(d0[keep], d1[keep]).all()
        assert f.contains_digests(d0[::4], d1[::4]).mean() < 0.01
        # deleting a never-inserted key raises (delete ⊆ insert required)
        n0, n1 = _digests(1, seed=6)
        with pytest.raises(ValueError):
            f.delete_digests(n0, n1)

    def test_merge_from_same_geometry(self):
        d0, d1 = _digests(40_000, seed=7)
        m = 32768
        a = build_cuckoo_from_digests(d0[:20_000], d1[:20_000], m=m)
        b = build_cuckoo_from_digests(d0[20_000:], d1[20_000:], m=m)
        a.merge_from(b)
        assert a.n_items == 40_000
        assert a.contains_digests(d0, d1).all()
        with pytest.raises(ValueError):
            a.merge_from(build_cuckoo_from_digests(d0[:100], d1[:100], m=m * 2))

    def test_deterministic_rebuild_and_roundtrip(self):
        d0, d1 = _digests(30_000, seed=8)
        a = build_cuckoo_from_digests(d0, d1)
        b = build_cuckoo_from_digests(d0, d1)
        assert np.array_equal(a.table, b.table)  # no RNG anywhere
        c = CuckooFilter.deserialize(a.serialize())
        assert np.array_equal(a.table, c.table) and c.n_items == a.n_items

    def test_bytes_path_dedups(self):
        keys = [f"k-{i % 1000}".encode() for i in range(5000)]
        f = build_cuckoo_from_bytes(keys)
        assert f.n_items == 1000
        assert f.contains_bytes([b"k-0", b"k-999"]).all()
        assert not f.contains_bytes([b"absent"]).any()

    def test_space_beats_bloom_at_equal_fpr_when_load_high(self):
        # CoNEXT'14 §5.1/paper triad: at load ≥0.9, cuckoo bits/key
        # (16/α) undercuts a Bloom filter hitting the same FPR
        # (1.44·log2(1/ε), ε = 2b/2^16 → ~18.7 bits/key)
        m = 8192
        n = int(m * BUCKET_SLOTS * 0.95)
        d0, d1 = _digests(n, seed=9)
        f = build_cuckoo_from_digests(d0, d1, m=m)
        bloom_bits = 1.44 * np.log2(1 / f.fpr_bound())
        assert f.bits_per_key < bloom_bits
