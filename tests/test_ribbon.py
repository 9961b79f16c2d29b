"""Ribbon filter core (filters/ribbon.py): membership contract, space
frontier vs fuse/XOR, determinism, serialization."""

from __future__ import annotations

import numpy as np
import pytest

from xorfilter_net_spark.filters.fuse_core import fuse_layout
from xorfilter_net_spark.filters.ribbon import (
    RibbonFilter,
    build_ribbon_from_bytes,
    ribbon_layout,
)
from xorfilter_net_spark.filters.xor_core import table_size as xor_table_size


def _keys(n: int, tag: str = "k") -> list[bytes]:
    return [f"{tag}:{i:08d}".encode() for i in range(n)]


@pytest.mark.parametrize("width,fpr_bound", [(8, 0.02), (16, 0.005), (32, 0.0001)])
def test_zero_false_negatives_and_fpr(width, fpr_bound):
    members = _keys(2000)
    f = build_ribbon_from_bytes(members, width=width, seed=12345)
    assert f.contains_bytes(members).all()  # the hard invariant
    non = _keys(8000, tag="nm")
    fpr = f.contains_bytes(non).mean()
    assert fpr <= fpr_bound, fpr


def test_space_frontier_ribbon_below_fuse_below_xor():
    n, width = 50_000, 16
    _, ribbon_len = ribbon_layout(n)
    _, _, fuse_len = fuse_layout(n)
    assert ribbon_len < fuse_len < xor_table_size(n)
    # the headline claim: ~1.05n at scale
    assert ribbon_len <= 1.08 * n


def test_same_seed_bit_identical_and_order_invariant():
    ks = _keys(500)
    a = build_ribbon_from_bytes(ks, width=16, seed=7)
    b = build_ribbon_from_bytes(list(reversed(ks)), width=16, seed=7)
    assert a.seed == b.seed and a.size == b.size
    assert np.array_equal(a.slots, b.slots)
    c = build_ribbon_from_bytes(ks, width=16, seed=8)
    assert not np.array_equal(a.slots, c.slots)


def test_duplicates_and_tiny_sets():
    f = build_ribbon_from_bytes([b"x", b"x", b"x", b"y"], width=8, seed=1)
    assert f.contains_bytes([b"x", b"y"]).all()
    for n in (1, 2, 3):
        g = build_ribbon_from_bytes(_keys(n), width=8, seed=1)
        assert g.contains_bytes(_keys(n)).all()
    with pytest.raises(ValueError):
        build_ribbon_from_bytes([], width=8)
    # empty byte string is a legal, distinct member (reference contract,
    # DeterministicIntegrationTests.cs:220-229)
    h = build_ribbon_from_bytes([b"", b"a"], width=16, seed=3)
    assert h.contains_bytes([b"", b"a"]).all()


def test_serialization_roundtrip():
    ks = _keys(300)
    f = build_ribbon_from_bytes(ks, width=16, seed=42)
    g = RibbonFilter.from_json(f.to_json())
    assert np.array_equal(f.slots, g.slots)
    assert g.contains_bytes(ks).all()
    # small-n builds pay the 4/sqrt(n) slack + the W-1 tail; the scale
    # sizing claim is asserted in test_space_frontier_* instead
    assert f.metrics["bits_per_key"] < 26.0
