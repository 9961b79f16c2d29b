"""Weighted mixture interleave (pipeline/mixture.py): proportionality,
determinism, and oracle parity."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from xorfilter_net_spark.pipeline.mixture import mixture_interleave, mixture_sql

WEIGHTS = {"a": 3, "b": 2, "c": 1}


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, ("a", "b", "c", "drop")[i % 4]) for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_schedule_is_weight_proportional(corpus):
    pdf = (
        mixture_interleave(corpus, "source", WEIGHTS)
        .toPandas()
        .sort_values(["interleave_key", "source", "doc_id"])
        .reset_index(drop=True)
    )
    # unlisted sources are excluded
    assert set(pdf["source"]) == set(WEIGHTS)
    assert len(pdf) == 300
    # per-source ranks are dense 0..n_s-1
    for s, g in pdf.groupby("source"):
        assert sorted(g["r"]) == list(range(len(g)))
    # stride scheduling: any schedule prefix holds ~w_s/sum(w) per source.
    # In a prefix of length L the count for source s is floor-accurate to
    # within 1 of L * w_s / W.
    total_w = sum(WEIGHTS.values())
    # stay below ~200: source 'a' (100 docs) exhausts there and the
    # schedule degenerates to the surviving sources by design
    for L in (30, 60, 120, 180):
        head = pdf.head(L)["source"].value_counts()
        for s, w in WEIGHTS.items():
            assert abs(int(head.get(s, 0)) - L * w / total_w) <= 1, (L, s)


def test_partitioning_invariance(corpus):
    a = mixture_interleave(corpus.repartition(1), "source", WEIGHTS).toPandas()
    b = mixture_interleave(
        corpus.repartition(13, "doc_id"), "source", WEIGHTS
    ).toPandas()
    key = ["doc_id"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


def test_matches_duckdb_oracle(corpus):
    spark_pdf = (
        mixture_interleave(corpus, "source", WEIGHTS)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", corpus.toPandas())
    duck_pdf = (
        con.execute(mixture_sql("documents", "source", WEIGHTS))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        spark_pdf.astype({"r": "int64", "interleave_key": "int64"}),
        duck_pdf.astype({"r": "int64", "interleave_key": "int64"}),
    )


def test_rejects_bad_weights(corpus):
    with pytest.raises(ValueError):
        mixture_interleave(corpus, "source", {})
    with pytest.raises(ValueError):
        mixture_interleave(corpus, "source", {"a": 0})
    with pytest.raises(ValueError):
        mixture_interleave(corpus, "source", {"a": 1.5})
