"""Corpus n-gram LM signals (text/ngram_lm.py) and inverted index
(text/index.py) — unit + differential tests.

lm_coverage_documents / inverted_index_postings carry value-exact
DuckDB oracles in the driver gate; here we pin the float NLL against a
NumPy reference (the part deliberately excluded from the SQL oracle)
and the operators' structural contracts.
"""

from __future__ import annotations

import math
from collections import Counter

from xorfilter_net_spark.text.index import build_postings
from xorfilter_net_spark.text.ngram_lm import (
    add_one_nll,
    bigram_counts,
    lm_coverage_signals,
)

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat on the hat"),
    (3, "a dog ran over a hill"),
    (4, "the cat sat"),
    (5, "zzz"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_counts():
    bi: Counter = Counter()
    uni: Counter = Counter()
    for _, t in DOCS:
        ws = t.split(" ")
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    return bi, uni


def test_bigram_counts_match_python(spark):
    got = {
        (r.w1, r.w2): r.c for r in bigram_counts(_df(spark)).collect()
    }
    bi, _ = _py_counts()
    assert got == dict(bi)


def test_add_one_nll_matches_numpy(spark):
    bi, uni = _py_counts()
    v = len(uni)
    got = {r.doc_id: r.nll for r in add_one_nll(_df(spark)).collect()}
    for doc_id, t in DOCS:
        ws = t.split(" ")
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            assert doc_id not in got
            continue
        want = -sum(
            math.log((bi[p] + 1.0) / (uni[p[0]] + float(v))) for p in pairs
        ) / len(pairs)
        assert abs(got[doc_id] - want) < 1e-12


def test_coverage_orders_fluent_above_gibberish(spark):
    out = {
        r.doc_id: r
        for r in lm_coverage_signals(_df(spark), min_count=2).collect()
    }
    # docs 1/2/4 share 'the cat sat' bigrams (covered); doc 3 is unique
    assert out[4].coverage_e6 == 1000000
    assert out[1].coverage_e6 > out[3].coverage_e6 == 0
    assert out[5].n_bigrams == 0 and out[5].coverage_e6 == 0
    assert out[5].n_rare_tokens == 1  # 'zzz' occurs once
    assert out[3].n_rare_tokens == 4  # dog ran over hill (a appears 2x)


def test_postings_sharding_and_content(spark):
    out = build_postings(_df(spark), n_shards=2, min_df=1).collect()
    rows = {(r.term, r.shard): r for r in out}
    # 'the': docs 1 (tf2), 2 (tf2), 4 (tf1) -> shard0: doc2+doc4, shard1: doc1
    assert rows[("the", 0)].postings == "2:2,4:1"
    assert rows[("the", 1)].postings == "1:2"
    assert rows[("the", 0)].df_docs == 2 and rows[("the", 0)].tf_total == 3
    # shards partition the doc space
    for (term, shard), r in rows.items():
        for post in r.postings.split(","):
            assert int(post.split(":")[0]) % 2 == shard


def test_postings_min_df_is_global_not_per_shard(spark):
    out = build_postings(_df(spark), n_shards=2, min_df=3).collect()
    terms = {r.term for r in out}
    # 'the'(3 docs), 'cat'(3), 'sat'(3) survive; per-shard df is 1 or 2
    assert terms == {"the", "cat", "sat"}
    assert any(r.df_docs < 3 for r in out)
