"""Sequence-packing manifest (text/packing.py): invariants + determinism.

The manifest is a pure function of corpus content: the exclusive prefix
sum must partition the concatenated token stream exactly, the sequence
spans must tile it, and none of it may depend on physical partitioning.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from xorfilter_net_spark.text.packing import pack_sequences, pack_sql

SEQ_LEN = 16


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, ""),
        (2, None),
        (3, "a b c d e f g h i j k l m n o p q r s t"),
        (4, "short"),
        (5, "punctuation, splits; into: many! tokens? yes..."),
        (6, "x " * 40),
        (7, "one"),
        (8, "numbers 123 mix 456 runs 789"),
        (9, "tail document with a few words"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prefix_sum_partitions_the_stream(corpus):
    pdf = (
        pack_sequences(corpus, seq_len=SEQ_LEN)
        .toPandas()
        .sort_values("start_offset")
        .reset_index(drop=True)
    )
    # exclusive prefix sum: each start is the previous start + its tokens
    expect = pdf["n_tokens"].cumsum().shift(1, fill_value=0)
    assert (pdf["start_offset"] == expect).all()
    total = int(pdf["n_tokens"].sum())
    assert total > 2 * SEQ_LEN  # fixture actually spans several sequences

    # sequence spans tile the stream: doc touching token t claims seq t//S
    nonzero = pdf[pdf["n_tokens"] > 0]
    assert (nonzero["first_seq"] == nonzero["start_offset"] // SEQ_LEN).all()
    assert (
        nonzero["last_seq"]
        == (nonzero["start_offset"] + nonzero["n_tokens"] - 1) // SEQ_LEN
    ).all()
    assert int(nonzero["last_seq"].max()) == (total - 1) // SEQ_LEN
    # empty docs survive with a well-defined zero span
    zero = pdf[pdf["n_tokens"] == 0]
    assert len(zero) == 2
    assert zero["first_seq"].isna().all() and (zero["n_seqs"] == 0).all()


def test_partitioning_invariance(corpus):
    a = pack_sequences(corpus.repartition(1), seq_len=SEQ_LEN).toPandas()
    b = pack_sequences(corpus.repartition(7, "text"), seq_len=SEQ_LEN).toPandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_matches_duckdb_oracle(corpus):
    spark_pdf = (
        pack_sequences(corpus, seq_len=SEQ_LEN)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", corpus.toPandas())
    duck_pdf = (
        con.execute(pack_sql("documents", seq_len=SEQ_LEN))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for col in ("n_tokens", "start_offset", "n_seqs"):
        assert spark_pdf[col].astype("int64").equals(duck_pdf[col].astype("int64")), col
    for col in ("first_seq", "last_seq"):
        a = spark_pdf[col].astype("Float64")
        b = duck_pdf[col].astype("Float64")
        assert a.equals(b), col


def test_rejects_bad_seq_len(corpus):
    with pytest.raises(ValueError):
        pack_sequences(corpus, seq_len=0)
