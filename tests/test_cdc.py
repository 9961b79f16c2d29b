"""text/cdc.py: chunk tiling invariants, the shift-invariance property
(the whole point of CDC), dedup stats, and registered-query oracle
parity."""

from __future__ import annotations

import pytest

from xorfilter_net_spark.text.cdc import chunk_dedup_stats, content_defined_chunks

TEXT = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the window and the rain falls softly on the old tin roof all "
    "afternoon until the light fades and the street lamps come on one by "
    "one along the empty avenue"
)


def chunks_of(spark, rows):
    df = spark.createDataFrame(rows, "id long, text string")
    out = content_defined_chunks(df, "id", "text").collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(
            (r["chunk_idx"], r["start"], r["length"], r["chunk_hash"])
        )
    return {k: sorted(v) for k, v in by_id.items()}


def test_chunks_tile_document(spark):
    got = chunks_of(spark, [(1, TEXT)])[1]
    assert got[0][1] == 1  # first chunk starts at 1
    # chunks are contiguous and cover exactly the document
    for (i1, s1, l1, _), (i2, s2, _, _) in zip(got, got[1:]):
        assert i2 == i1 + 1 and s2 == s1 + l1
    assert got[-1][1] + got[-1][2] - 1 == len(TEXT)
    assert len(got) > 1  # boundary rule fires on a 200+-char text


def test_shift_invariance(spark):
    """Inserting a prefix changes only chunks up to the first boundary
    after the edit; every later chunk re-aligns hash-identically."""
    edited = "XXXXX " + TEXT
    got = chunks_of(spark, [(1, TEXT), (2, edited)])
    h1 = [c[3] for c in got[1]]
    h2 = [c[3] for c in got[2]]
    # the tail of the chunk streams coincides
    shared = set(h1) & set(h2)
    assert len(shared) >= len(h1) - 2
    assert h1[-1] == h2[-1]


def test_empty_and_null(spark):
    got = chunks_of(spark, [(1, ""), (2, None), (3, "abc")])
    assert 1 not in got and 2 not in got
    assert got[3] == [(0, 1, 3, got[3][0][3])]


def test_validation(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(ValueError):
        content_defined_chunks(df, "id", "text", boundary_hex="00")


def test_dedup_stats(spark):
    df = spark.createDataFrame(
        [(1, TEXT), (2, TEXT)], "id long, text string"
    )
    row = chunk_dedup_stats(
        content_defined_chunks(df, "id", "text")
    ).collect()[0]
    assert row["n_chunks"] == 2 * row["n_distinct_chunks"]
    assert row["n_dup_chunks"] == row["n_distinct_chunks"]
    assert row["dup_chars"] == len(TEXT)


def test_registered_query_matches_duckdb(spark, sf_tiny):
    import duckdb

    from xorfilter_net_spark import entrypoints

    got = sorted(
        tuple(r)
        for r in entrypoints.QUERIES["cdc_chunks_documents"](
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
            entrypoints.ORACLES["cdc_chunks_documents"]
        ).fetchall()
    )
    assert got == want
    assert len(got) > 500
