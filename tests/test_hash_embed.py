"""text/hash_embed.py: bucket portability, embedding geometry, and the
registered exact counts oracle + ANN gate."""

from __future__ import annotations

import math

import pytest

from xorfilter_net_spark.text.hash_embed import (
    bucket_sql,
    hash_embeddings,
    token_bucket_counts,
)


def test_counts_and_bucket_portability(spark):
    import duckdb

    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "b b"), (3, ""), (4, None)],
        "id long, text string",
    )
    got = sorted(
        tuple(r) for r in token_bucket_counts(df, "id", "text", 64).collect()
    )
    # same expression re-derived in DuckDB over the same tokens
    con = duckdb.connect()
    want = sorted(
        tuple(r)
        for r in con.execute(
            "with t as (select * from (values (1, 'a'), (1, 'b'), (1, 'a'), "
            "(1, 'c'), (2, 'b'), (2, 'b')) v(id, tok)) "
            f"select id, {bucket_sql('tok', 64)} as bucket, count(*) as cnt "
            "from t group by 1, 2"
        ).fetchall()
    )
    assert got == want
    # doc 1 has 3 distinct tokens ('a' counted twice)
    d1 = [(b, c) for (i, b, c) in got if i == 1]
    assert sorted(c for _, c in d1) == [1, 1, 2]


def test_embeddings_unit_norm_and_cosine_order(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma"),      # near-copy of 1
            (3, "zeta eta theta iota"),   # disjoint
        ],
        "id long, text string",
    )
    emb = {
        r["id"]: r["embedding"]
        for r in hash_embeddings(df, "id", "text", 128).collect()
    }
    for v in emb.values():
        assert abs(sum(x * x for x in v) - 1.0) < 1e-9

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    assert cos(emb[1], emb[2]) > 0.8
    assert cos(emb[1], emb[2]) > cos(emb[1], emb[3]) + 0.5


def test_empty_docs_dropped_and_validation(spark):
    df = spark.createDataFrame([(1, ""), (2, "x")], "id long, text string")
    assert hash_embeddings(df, "id", "text", 32).count() == 1
    with pytest.raises(ValueError):
        token_bucket_counts(df, "id", "text", dim=1)


@pytest.mark.parametrize("name", ["q_token_bucket_counts", "hash_embed_ann_ok"])
def test_registered_queries(spark, sf_tiny, name):
    import duckdb

    from xorfilter_net_spark import entrypoints

    got = sorted(
        tuple(r) for r in entrypoints.QUERIES[name](spark, sf_tiny).collect()
    )
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{sf_tiny}/documents.parquet')"
    )
    want = sorted(
        tuple(r) for r in con.execute(entrypoints.ORACLES[name]).fetchall()
    )
    assert got == want and len(got) > 0
