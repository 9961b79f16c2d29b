"""Distributed-artifact (table-persisted) XOR filter: build + cogrouped probe.

Covers the 10^12-key path of filters/table.py: executor-parallel artifact
write (no driver collect of slots), shard-cogrouped probing, and
equivalence with the driver-collected build (same kernel => bit-identical
shards; reference determinism contract, DeterministicIntegrationTests.cs:13-34).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xorfilter_net_spark.filters.spark_build import (
    build_sharded_xor_filter,
    is_member_sharded,
)
from xorfilter_net_spark.filters.table import XorFilterTable, build_xor_filter_table
from xorfilter_net_spark.sources.transcripts import load_transcripts, with_membership_key


@pytest.fixture(scope="module")
def keyed(spark, sf_tiny):
    return with_membership_key(load_transcripts(spark, sf_tiny)).select("key").distinct()


def test_table_build_bit_identical_to_collected_build(spark, keyed, tmp_path):
    tab = build_xor_filter_table(
        keyed, "key", str(tmp_path / "art"), num_shards=8, width=16,
        seed=42, jvm_digests=True,
    )
    mem = build_sharded_xor_filter(
        keyed, "key", num_shards=8, width=16, seed=42, jvm_digests=True
    )
    loaded = tab.to_sharded()
    assert set(loaded.shards) == set(mem.shards)
    for sid, f in mem.shards.items():
        g = loaded.shards[sid]
        assert g.size == f.size
        assert np.array_equal(g.seeds, f.seeds)
        assert np.array_equal(g.slots, f.slots)
    assert tab.metrics["n_keys"] == keyed.count()


def test_cogroup_probe_zero_false_negatives(spark, keyed, tmp_path):
    tab = build_xor_filter_table(
        keyed, "key", str(tmp_path / "art"), num_shards=8, width=16,
        seed=7, jvm_digests=True,
    )
    n = keyed.count()
    found = (
        tab.probe(keyed, "key")
        .agg(F.sum(F.col("is_member").cast("long")).alias("n"))
        .collect()[0]["n"]
    )
    assert found == n


def test_cogroup_probe_matches_broadcast_probe_rowwise(spark, keyed, tmp_path):
    """Same artifact => the cogrouped probe and the broadcast Arrow probe
    agree on every row, INCLUDING which non-members are false positives."""
    tab = build_xor_filter_table(
        keyed, "key", str(tmp_path / "art"), num_shards=8, width=8,
        seed=3, jvm_digests=True,
    )
    sxf = tab.to_sharded()
    non = keyed.selectExpr("'nm:' || key as key")
    via_table = {
        r["key"]: r["is_member"] for r in tab.probe(non, "key").collect()
    }
    via_bcast = {
        r["key"]: r["is_member"]
        for r in non.withColumn(
            "is_member", is_member_sharded(spark, sxf, "key")
        ).collect()
    }
    assert via_table == via_bcast


def test_murmur_digest_mode_table(spark, keyed, tmp_path):
    tab = build_xor_filter_table(
        keyed, "key", str(tmp_path / "art"), num_shards=4, width=16,
        seed=9, jvm_digests=False,
    )
    n = keyed.count()
    probed = tab.probe(keyed, "key")
    assert probed.columns == ["key", "is_member"]
    assert (
        probed.agg(F.sum(F.col("is_member").cast("long")).alias("n"))
        .collect()[0]["n"]
        == n
    )


def test_absent_shards_probe_false_not_error(spark, tmp_path):
    tiny = spark.createDataFrame(
        [(f"k{i}",) for i in range(3)], "key string"
    )
    tab = build_xor_filter_table(
        tiny, "key", str(tmp_path / "art"), num_shards=64, width=16,
        seed=1, jvm_digests=True,
    )
    # members still found
    assert (
        tab.probe(tiny, "key")
        .agg(F.sum(F.col("is_member").cast("long")).alias("n"))
        .collect()[0]["n"]
        == 3
    )
    # 500 disjoint probes route mostly to absent shards: no errors, and at
    # width 16 the expected false-positive count is ~0
    non = spark.createDataFrame([(f"x{i}",) for i in range(500)], "key string")
    fp = (
        tab.probe(non, "key")
        .agg(F.sum(F.col("is_member").cast("long")).alias("n"))
        .collect()[0]["n"]
    )
    assert fp == 0


def test_load_roundtrip(spark, keyed, tmp_path):
    path = str(tmp_path / "art")
    tab = build_xor_filter_table(
        keyed, "key", path, num_shards=8, width=16, seed=42, jvm_digests=True
    )
    re = XorFilterTable.load(spark, path)
    assert (re.width, re.seed, re.num_shards, re.digest_kind, re.mode) == (
        tab.width, tab.seed, tab.num_shards, tab.digest_kind, tab.mode
    )
    n = keyed.count()
    assert (
        re.probe(keyed, "key")
        .agg(F.sum(F.col("is_member").cast("long")).alias("n"))
        .collect()[0]["n"]
        == n
    )


def test_blob_transport_bit_identical_and_probes(spark, keyed, tmp_path):
    """transport='blob' (map-side packed shuffle) must produce the same
    artifact bytes as the row-transport build, and probe identically —
    including when the corpus carries duplicates (blobs ship raw rows)."""
    dup = keyed.unionAll(keyed.limit(50))
    rows = build_xor_filter_table(
        dup, "key", str(tmp_path / "rows"), num_shards=8, width=16,
        seed=42, jvm_digests=True,
    )
    blob = build_xor_filter_table(
        dup, "key", str(tmp_path / "blob"), num_shards=8, width=16,
        seed=42, jvm_digests=True, transport="blob",
    )
    a, b = rows.to_sharded(), blob.to_sharded()
    assert set(a.shards) == set(b.shards)
    for sid, f in a.shards.items():
        assert np.array_equal(b.shards[sid].slots, f.slots)
        assert np.array_equal(b.shards[sid].seeds, f.seeds)
    assert blob.metrics["n_keys"] == keyed.count()
    n = keyed.count()
    found = (
        blob.probe(keyed, "key")
        .agg(F.sum(F.col("is_member").cast("long")).alias("n"))
        .collect()[0]["n"]
    )
    assert found == n


def test_blob_transport_rejects_shuffle_dedup(spark, keyed, tmp_path):
    with pytest.raises(ValueError, match="in_shard"):
        build_xor_filter_table(
            keyed, "key", str(tmp_path / "x"), num_shards=4, width=8,
            jvm_digests=True, transport="blob", dedup="shuffle",
        )


def test_table_probe_sql_shuffle_matches_cogroup_rowwise(spark, keyed, tmp_path):
    """The zero-Python shuffled-hash-join probe over the distributed
    artifact agrees row-for-row (incl. false positives) with the
    cogrouped Arrow probe of the SAME artifact."""
    tab = build_xor_filter_table(
        keyed, "key", str(tmp_path / "art"), num_shards=8, width=8,
        seed=3, jvm_digests=True,
    )
    mixed = keyed.union(keyed.selectExpr("'nm:' || key as key"))
    via_sql = {
        r["key"]: r["is_member"] for r in tab.probe_sql(mixed, "key").collect()
    }
    via_cog = {
        r["key"]: r["is_member"] for r in tab.probe(mixed, "key").collect()
    }
    assert via_sql == via_cog
    # all true members found (zero false negatives)
    assert all(via_sql[r["key"]] for r in keyed.collect())


def test_table_probe_sql_requires_sqlhash(spark, keyed, tmp_path):
    tab = build_xor_filter_table(
        keyed, "key", str(tmp_path / "art"), num_shards=4, width=16, seed=5,
    )
    with pytest.raises(ValueError, match="jvm_digests"):
        tab.probe_sql(keyed, "key")
