"""DSIR (text/dsir.py): pure-Python differential + determinism.

The float log-ratio never enters a SQL oracle (repo convention); this
differential recomputes the whole pipeline — md5-bucketed grams, add-1
log ratios, micro-quantization, per-doc integer sums — single-machine
and requires exact integer equality with the Spark result.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from xorfilter_net_spark.text.dsir import (
    N_HEX_DEFAULT,
    dsir_scores,
    dsir_select,
    gram_buckets,
)

RAW = [
    (0, "spark table scan fast join merge sort"),
    (1, "row batch value hash key agg window"),
    (2, "curated reference citation spark join"),
    (3, "table table table scan scan merge"),
    (4, ""),
    (5, "one"),
    (6, "curated reference citation curated reference citation"),
    (7, "key value key value key value sort"),
]
TARGET = [
    (100, "curated reference citation verified"),
    (101, "curated reference citation spark"),
]


def _grams(text: str) -> list[str]:
    toks = (text or "").split(" ")
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(g: str, n_hex: int = N_HEX_DEFAULT) -> str:
    return hashlib.md5(g.encode()).hexdigest()[:n_hex]


def _py_scores(raw, target, n_hex: int = N_HEX_DEFAULT):
    b_total = 16**n_hex
    tc: dict[str, int] = {}
    rc: dict[str, int] = {}
    for _, t in target:
        for g in _grams(t):
            b = _bucket(g, n_hex)
            tc[b] = tc.get(b, 0) + 1
    for _, t in raw:
        for g in _grams(t):
            b = _bucket(g, n_hex)
            rc[b] = rc.get(b, 0) + 1
    n_t, n_r = sum(tc.values()), sum(rc.values())
    lam = {
        b: int(
            round(
                (
                    math.log((tc.get(b, 0) + 1) / (n_t + b_total))
                    - math.log((rc.get(b, 0) + 1) / (n_r + b_total))
                )
                * 1_000_000
            )
        )
        for b in set(tc) | set(rc)
    }
    out = {}
    # Spark `div` truncates toward zero; replicate exactly
    for i, t in raw:
        gs = _grams(t)
        s = sum(lam[_bucket(g, n_hex)] for g in gs)
        q = abs(s) // len(gs)
        out[i] = (len(gs), s, q if s >= 0 else -q)
    return out


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string").repartition(3)
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    return raw, tgt


def test_gram_stream_matches_python(spark, frames):
    raw, _ = frames
    got = {
        (r["doc_id"], r["bucket"]): r["c"]
        for r in gram_buckets(raw, "doc_id", "text")
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    want: dict[tuple[int, str], int] = {}
    for i, t in RAW:
        for g in _grams(t):
            k = (i, _bucket(g))
            want[k] = want.get(k, 0) + 1
    assert got == want


def test_scores_differential_exact(spark, frames):
    raw, tgt = frames
    got = {
        r["doc_id"]: (r["n_grams"], r["score_e6"], r["avg_e6"])
        for r in dsir_scores(raw, tgt, "doc_id", "text").collect()
    }
    assert got == _py_scores(RAW, TARGET)


def test_scores_partitioning_invariant(spark, frames):
    raw, tgt = frames
    a = sorted(
        map(tuple, dsir_scores(raw.repartition(1), tgt, "doc_id", "text").collect())
    )
    b = sorted(
        map(tuple, dsir_scores(raw.repartition(7), tgt, "doc_id", "text").collect())
    )
    assert a == b


def test_select_prefers_target_like(spark, frames):
    raw, tgt = frames
    top = [r["doc_id"] for r in dsir_select(raw, tgt, "doc_id", "text", k=2).collect()]
    # docs 2 and 6 carry the target vocabulary
    assert set(top) == {2, 6}
