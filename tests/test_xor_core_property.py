"""Hypothesis property tests for the XOR-filter core: the reference's
hard invariants (zero false negatives, dedup/order invariance, seeded
determinism — BaseXorFilter.cs contracts) under *arbitrary* byte sets,
not just the fixture families the example-based tests use."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from xorfilter_net_spark.filters.xor_core import build_from_bytes

byte_keys = st.lists(
    st.binary(min_size=0, max_size=64), min_size=1, max_size=300
)


@settings(max_examples=60, deadline=None)
@given(keys=byte_keys, width=st.sampled_from([8, 16, 32]), seed=st.integers(0, 2**31 - 1))
def test_zero_false_negatives_any_bytes(keys, width, seed):
    """No false negatives, ever — for any byte multiset (including the
    empty byte string and duplicates), any width, any seed
    (DeterministicIntegrationTests.cs:74-89, 216-229)."""
    f = build_from_bytes(keys, width=width, seed=seed)
    assert f.contains_bytes(keys).all()


@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.data_too_large])
@given(keys=byte_keys, seed=st.integers(0, 2**31 - 1), data=st.data())
def test_dedup_order_and_seed_invariance(keys, seed, data):
    """Shuffled + duplicated input with the same seed yields a filter
    with identical slot tables (ToUniqueByteArray + seeded determinism:
    BaseXorFilter.cs:28,126-135; DeterministicIntegrationTests.cs:13-34,
    91-107, 255-276)."""
    perm = data.draw(st.permutations(list(range(len(keys)))))
    shuffled = [keys[i] for i in perm] + keys[: len(keys) // 2]
    a = build_from_bytes(keys, width=16, seed=seed)
    b = build_from_bytes(shuffled, width=16, seed=seed)
    assert np.array_equal(a.slots, b.slots)
    assert np.array_equal(a.seeds, b.seeds) and a.size == b.size


@settings(max_examples=30, deadline=None)
@given(keys=byte_keys, seed=st.integers(0, 2**31 - 1))
def test_serialize_roundtrip_preserves_membership(keys, seed):
    f = build_from_bytes(keys, width=8, seed=seed)
    g = type(f).from_json(f.to_json())
    assert np.array_equal(f.slots, g.slots)
    assert g.contains_bytes(keys).all()
