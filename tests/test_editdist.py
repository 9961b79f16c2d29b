"""dedup/editdist.py: PassJoin pigeonhole exactness (differential vs a
brute-force DP over adversarial tiny-alphabet strings, including
degenerate short strings), plan hygiene, and registered-query oracle
parity."""

from __future__ import annotations

import itertools
import random

import pytest

from xorfilter_net_spark.dedup.editdist import editdist_join


def lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


def brute(rows, d):
    out = {}
    for (ia, ka), (ib, kb) in itertools.combinations(rows, 2):
        dist = lev(ka, kb)
        if dist <= d:
            lo, hi = (ia, ib) if ia < ib else (ib, ia)
            out[(lo, hi)] = dist
    return out


def run(spark, rows, d):
    df = spark.createDataFrame(rows, "id long, key string")
    got = editdist_join(df, "id", "key", max_dist=d).collect()
    assert len(got) == len({(r["id_a"], r["id_b"]) for r in got})
    return {(r["id_a"], r["id_b"]): r["dist"] for r in got}


@pytest.mark.parametrize("d", [1, 2])
def test_differential_tiny_alphabet(spark, d):
    """Tiny alphabet + short lengths = maximal collision pressure on the
    segment machinery; includes strings shorter than d+1 chars and the
    empty string (degenerate-pool path)."""
    rng = random.Random(1234 + d)
    rows = [
        (i, "".join(rng.choice("ab") for _ in range(rng.randint(0, 8))))
        for i in range(60)
    ]
    assert run(spark, rows, d) == brute(rows, d)


def test_differential_realistic(spark):
    """Word-ish strings with planted substitutions, indels, and exact
    dups at varying lengths."""
    base = [
        "the quick brown fox jumps",
        "pack my box with five dozen jugs",
        "sphinx of black quartz judge my vow",
        "how vexingly quick daft zebras jump",
    ]
    rows, rid = [], 0
    for b in base:
        for variant in (
            b,
            b,  # exact dup -> dist 0 pair
            b[:10] + "X" + b[11:],  # substitution
            b[:5] + b[6:],  # deletion
            b + "!",  # insertion at end
            "Z" + b,  # insertion at front
        ):
            rows.append((rid, variant))
            rid += 1
    got, want = run(spark, rows, 2), brute(rows, 2)
    assert got == want
    assert any(v == 0 for v in want.values())
    assert any(v == 2 for v in want.values())


def test_null_keys_ignored(spark):
    rows = [(0, "abc"), (1, None), (2, "abd")]
    df = spark.createDataFrame(rows, "id long, key string")
    got = editdist_join(df, "id", "key", 1).collect()
    assert [(r["id_a"], r["id_b"], r["dist"]) for r in got] == [(0, 2, 1)]


def test_max_dist_validation(spark):
    df = spark.createDataFrame([(0, "x")], "id long, key string")
    with pytest.raises(ValueError):
        editdist_join(df, "id", "key", 0)


def test_no_python_in_plan(spark):
    df = spark.createDataFrame([(0, "abcdef"), (1, "abcdxf")], "id long, key string")
    plan = (
        editdist_join(df, "id", "key", 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan, plan


def test_registered_query_matches_duckdb_oracle(spark, sf_tiny):
    import duckdb

    from xorfilter_net_spark import entrypoints

    got = sorted(
        tuple(r)
        for r in entrypoints.QUERIES["editdist_near_dup_pairs"](
            spark, sf_tiny
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{sf_tiny}/documents.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            entrypoints.ORACLES["editdist_near_dup_pairs"]
        ).fetchall()
    )
    assert got == want
    assert len(got) > 0  # injected variants keep it non-vacuous
    assert {t[2] for t in got} >= {1, 2}  # both distances exercised


# ---------------------------------------------------------------- property
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    keys=st.lists(
        st.text(alphabet="aé✓", max_size=6), min_size=2, max_size=10
    ),
    d=st.integers(1, 2),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_property_unicode_alphabet(spark, keys, d):
    """Multi-byte alphabet pins codepoint (not byte) semantics through
    length/substring/levenshtein; duplicates, empties, and the
    degenerate short-string pool all arise naturally."""
    rows = list(enumerate(keys))
    assert run(spark, rows, d) == brute(rows, d)
