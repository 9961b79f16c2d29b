"""sketches/bitmap.py: exactness vs Python sets, merge algebra
(associative/commutative/idempotent, partitioning-invariant bytes),
domain validation, and registered-query oracle parity."""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pytest

from xorfilter_net_spark.sketches.bitmap import BitmapSketch


def fold(sk, keys, chunks=1):
    st = sk.zero()
    arrs = np.array_split(np.array(keys, dtype=np.int64), chunks)
    parts = []
    for a in arrs:
        p = sk.update(sk.zero(), pd.DataFrame({"k": a}))
        parts.append(p)
    for p in parts:
        st = sk.merge(st, p)
    return st


def test_exact_vs_python_sets():
    rng = random.Random(7)
    a = [rng.randrange(0, 5000) for _ in range(3000)]
    b = [rng.randrange(0, 5000) for _ in range(3000)]
    sk = BitmapSketch(5000)
    sa, sb = fold(sk, a, 4), fold(sk, b, 3)
    A, B = set(a), set(b)
    assert sk.estimate(sa) == len(A)
    assert sk.intersect_count(sa, sb) == len(A & B)
    assert sk.union_count(sa, sb) == len(A | B)
    assert sk.diff_count(sa, sb) == len(A - B)


def test_merge_is_partitioning_invariant():
    rng = random.Random(11)
    keys = [rng.randrange(0, 1000) for _ in range(800)]
    sk = BitmapSketch(1000)
    blobs = {
        chunks: sk.serialize(fold(sk, keys, chunks)) for chunks in (1, 3, 7)
    }
    assert len(set(blobs.values())) == 1  # bit-identical state bytes


def test_merge_idempotent_and_commutative():
    sk = BitmapSketch(100)
    a = fold(sk, [1, 2, 3])
    b = fold(sk, [3, 4])
    assert sk.serialize(sk.merge(a, b)) == sk.serialize(sk.merge(b, a))
    assert sk.serialize(sk.merge(a, a)) == sk.serialize(a)


def test_domain_validation_and_roundtrip():
    sk = BitmapSketch(10)
    with pytest.raises(ValueError):
        sk.update(sk.zero(), pd.DataFrame({"k": [10]}))
    with pytest.raises(ValueError):
        sk.update(sk.zero(), pd.DataFrame({"k": [-1]}))
    with pytest.raises(ValueError):
        BitmapSketch(0)
    st = fold(sk, [0, 9])
    assert np.array_equal(sk.deserialize(sk.serialize(st)), st)
    # nulls are ignored, not errors
    st2 = sk.update(sk.zero(), pd.DataFrame({"k": pd.array([1, None], dtype="Int64")}))
    assert sk.estimate(st2) == 1


def test_registered_query_matches_duckdb(spark, sf_tiny):
    import duckdb

    from xorfilter_net_spark import entrypoints

    got = [
        tuple(r)
        for r in entrypoints.QUERIES["bitmap_set_ops_users"](
            spark, sf_tiny
        ).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "create view events as select * from "
        f"read_parquet('{sf_tiny}/events.parquet')"
    )
    want = [
        tuple(r)
        for r in con.execute(
            entrypoints.ORACLES["bitmap_set_ops_users"]
        ).fetchall()
    ]
    assert got == want
    assert got[0][2] > 0  # non-vacuous intersection
