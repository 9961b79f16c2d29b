"""sources/skipping.py: zero-false-negative pruning (pruned scan ==
full scan), real file skipping, absent-key near-total prune, and the
registered-query oracle parity."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from xorfilter_net_spark.sources.skipping import (
    build_skip_index,
    prune_files,
    scan_with_skip_index,
)


@pytest.fixture(scope="module")
def dataset(spark, sf_tiny):
    """documents spread over 8 files keyed by doc_id ranges (so point
    lookups have locality for the index to exploit)."""
    root = tempfile.mkdtemp(prefix="skipidx_")
    data, idx = root + "/data", root + "/idx"
    docs = spark.read.parquet(f"{sf_tiny}/documents.parquet")
    (
        docs.repartitionByRange(8, "doc_id")
        .write.mode("overwrite")
        .parquet(data)
    )
    build_skip_index(spark, data, "doc_id", idx, width=8)
    return data, idx


def test_pruned_scan_equals_full_scan(spark, dataset):
    data, idx = dataset
    keys = [3, 17, 41]
    got = sorted(
        tuple(r)
        for r in scan_with_skip_index(spark, data, idx, "doc_id", keys)
        .select("doc_id", "n_chars")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in spark.read.parquet(data)
        .filter(F.col("doc_id").isin(keys))
        .select("doc_id", "n_chars")
        .collect()
    )
    assert got == want
    assert len(got) == 3  # zero false negatives: every key found


def test_files_actually_skipped(spark, dataset):
    data, idx = dataset
    kept, total = prune_files(spark, idx, [3])
    assert total == 8
    # key 3 lives in exactly one range file; FPs add at most a couple
    assert 1 <= len(kept) <= 3


def test_absent_keys_prune_everything(spark, dataset):
    data, idx = dataset
    kept, total = prune_files(spark, idx, [10**12 + 7])
    # each file has ~2^-8 FP chance per probe; 8 files -> usually 0 kept
    assert len(kept) <= 2
    assert (
        scan_with_skip_index(
            spark, data, idx, "doc_id", [10**12 + 7]
        ).count()
        == 0
    )


def test_empty_values(spark, dataset):
    data, idx = dataset
    kept, total = prune_files(spark, idx, [])
    assert kept == [] and total == 8


def test_registered_query_matches_duckdb(spark, sf_tiny):
    import duckdb

    from xorfilter_net_spark import entrypoints

    got = sorted(
        tuple(r)
        for r in entrypoints.QUERIES["skip_index_point_lookup"](
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
            entrypoints.ORACLES["skip_index_point_lookup"]
        ).fetchall()
    )
    assert got == want
    assert len(got) > 0


def test_hive_partitioned_dataset_keeps_partition_columns(spark, sf_tiny):
    import tempfile

    root = tempfile.mkdtemp(prefix="skipidx_hive_")
    data, idx = root + "/data", root + "/idx"
    docs = spark.read.parquet(f"{sf_tiny}/documents.parquet")
    (
        docs.write.mode("overwrite")
        .partitionBy("source")
        .parquet(data)
    )
    build_skip_index(spark, data, "doc_id", idx, width=8)
    keys = [3, 17]
    got = sorted(
        tuple(r)
        for r in scan_with_skip_index(spark, data, idx, "doc_id", keys)
        .select("doc_id", "source")  # source IS the partition column
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in spark.read.parquet(data)
        .filter(F.col("doc_id").isin(keys))
        .select("doc_id", "source")
        .collect()
    )
    assert got == want and len(got) == 2
