"""Normalization-insensitive dedup (text/normalize.py)."""

from __future__ import annotations

from xorfilter_net_spark.text.normalize import (
    normalized_dedup,
    with_normalized_text,
)


def test_normalization_chain(spark):
    df = spark.createDataFrame(
        [(1, "  Hello,   WORLD!! "), (2, None), (3, "a-b c_d")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.norm_text for r in with_normalized_text(df).collect()
    }
    assert got[1] == "hello world"
    assert got[2] == ""
    assert got[3] == "a b c d"


def test_dedup_collapses_formatting_variants(spark):
    rows = [
        (1, "The quick brown fox"),
        (2, "the QUICK brown fox!!"),
        (3, "the  quick   brown fox"),
        (4, "a different document"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = normalized_dedup(df)
    got = {r.doc_id: r.text for r in out.collect()}
    # min-id survivor keeps its ORIGINAL (un-normalized) text
    assert got == {1: "The quick brown fox", 4: "a different document"}


def test_distinct_content_survives(spark):
    rows = [(i, f"doc number {i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert normalized_dedup(df).count() == 10
