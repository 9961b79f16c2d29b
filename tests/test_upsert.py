"""MERGE INTO snapshot maintenance (sources/upsert.py): upsert/delete
parity with the relational definition + the pruned-rewrite property
(untouched bucket dirs are neither read nor rewritten)."""

import os

from pyspark.sql import functions as F

from xorfilter_net_spark.sources.upsert import (
    BUCKET_COL,
    merge_into,
    read_snapshot,
    write_snapshot,
)


def _file_index(path: str) -> dict:
    """parquet file -> (size, mtime) per bucket dir."""
    idx = {}
    for root, _, files in os.walk(path):
        for fname in files:
            if fname.endswith(".parquet"):
                p = os.path.join(root, fname)
                st = os.stat(p)
                idx[p] = (st.st_size, st.st_mtime_ns)
    return idx


def test_merge_upsert_delete_parity_and_pruned_rewrite(spark, sf_tiny, tmp_path):
    docs = spark.read.parquet(f"{sf_tiny}/documents.parquet")
    snap = str(tmp_path / "snap")
    write_snapshot(docs, snap, "doc_id", n_buckets=16)

    before = read_snapshot(spark, snap)
    assert before.count() == docs.count()

    # delta: update every doc_id % 50 == 0 (uppercase text), insert two
    # new docs, delete every doc_id % 97 == 0
    updates = docs.filter("doc_id % 50 = 0").withColumn(
        "text", F.upper("text")
    ).withColumn("__del", F.lit(False))
    inserts = spark.createDataFrame(
        [(10_000_001, "new doc a", "en", "web", 9),
         (10_000_002, "new doc b", "en", "web", 9)],
        docs.schema,
    ).withColumn("__del", F.lit(False))
    deletes = docs.filter("doc_id % 97 = 0").withColumn(
        "__del", F.lit(True)
    )
    delta = updates.unionByName(inserts).unionByName(deletes)
    # deletes win over updates for overlapping keys: drop dup keys first
    delta = delta.withColumn(
        "__pri", F.col("__del").cast("int")
    ).orderBy(F.desc("__pri")).drop("__pri")

    idx_before = _file_index(snap)
    stats = merge_into(spark, snap, delta, deleted_col="__del")
    assert 0 < stats["buckets_touched"] <= 16

    # relational definition of the same merge
    del_keys = [r["doc_id"] for r in deletes.select("doc_id").collect()]
    upd = updates.drop("__del")
    ins = inserts.drop("__del")
    expected = (
        docs.join(delta.select("doc_id").distinct(), "doc_id", "left_anti")
        .unionByName(upd.filter(~F.col("doc_id").isin(del_keys)))
        .unionByName(ins)
    )
    got = read_snapshot(spark, snap)
    assert got.count() == expected.count()
    assert (
        got.exceptAll(expected).count() == 0
        and expected.exceptAll(got).count() == 0
    )

    # pruned rewrite: files in untouched bucket dirs are byte-identical
    # (same path, size, mtime); touched buckets were rewritten
    idx_after = _file_index(snap)
    touched_dirs = set()
    for p in set(idx_before) - set(idx_after):
        touched_dirs.add(os.path.dirname(p))
    untouched_same = [
        p
        for p in idx_before
        if p in idx_after and idx_before[p] == idx_after[p]
    ]
    assert len(touched_dirs) == stats["buckets_touched"]
    assert len(untouched_same) > 0  # some buckets genuinely skipped
    for p in untouched_same:
        assert os.path.dirname(p) not in touched_dirs


def test_merge_noop_delta_rewrites_nothing(spark, sf_tiny, tmp_path):
    docs = spark.read.parquet(f"{sf_tiny}/documents.parquet")
    snap = str(tmp_path / "snap")
    write_snapshot(docs, snap, "doc_id", n_buckets=8)
    idx_before = _file_index(snap)
    empty = docs.filter("doc_id < 0")
    stats = merge_into(spark, snap, empty)
    assert stats["buckets_touched"] == 0
    assert _file_index(snap) == idx_before


def test_second_merge_composes(spark, sf_tiny, tmp_path):
    docs = spark.read.parquet(f"{sf_tiny}/documents.parquet")
    snap = str(tmp_path / "snap")
    write_snapshot(docs, snap, "doc_id", n_buckets=8)
    d1 = docs.filter("doc_id % 10 = 0").withColumn("text", F.lit("v1"))
    merge_into(spark, snap, d1)
    d2 = docs.filter("doc_id % 20 = 0").withColumn("text", F.lit("v2"))
    merge_into(spark, snap, d2)
    got = read_snapshot(spark, snap)
    n_v2 = got.filter("text = 'v2'").count()
    n_v1 = got.filter("text = 'v1'").count()
    exp_v2 = docs.filter("doc_id % 20 = 0").count()
    exp_v1 = docs.filter("doc_id % 10 = 0 and doc_id % 20 != 0").count()
    assert (n_v1, n_v2) == (exp_v1, exp_v2)
    assert got.count() == docs.count()
    # keys stayed unique through both merges
    assert got.select("doc_id").distinct().count() == got.count()
