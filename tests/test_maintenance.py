"""sources/maintenance.py — small-file compaction (O(change) contract)."""

from __future__ import annotations

import os

import pytest

from xorfilter_net_spark.sources.maintenance import (
    _data_files,
    compact_dataset,
    plan_compaction,
)


@pytest.fixture()
def fragmented(spark, tmp_path):
    """Partitioned dataset: lang=a heavily fragmented (16 files),
    lang=b healthy (1 file)."""
    root = str(tmp_path / "ds")
    a = spark.range(2000).selectExpr("id", "'a' as lang")
    a.repartition(16).write.partitionBy("lang").parquet(root)
    b = spark.range(2000, 2500).selectExpr("id", "'b' as lang")
    b.coalesce(1).write.mode("append").partitionBy("lang").parquet(root)
    return root


def _snapshot(d):
    return {
        os.path.basename(f): (os.path.getsize(f), os.path.getmtime(f))
        for f in _data_files(d)
    }


class TestPlan:
    def test_flags_only_fragmented_dirs(self, fragmented):
        plans = plan_compaction(fragmented, target_file_bytes=1 << 30)
        assert [os.path.basename(p.directory) for p in plans] == ["lang=a"]
        assert plans[0].n_files == 16 and plans[0].target_files == 1

    def test_healthy_layout_plans_nothing(self, spark, tmp_path):
        root = str(tmp_path / "ok")
        spark.range(100).coalesce(1).write.parquet(root)
        assert plan_compaction(root, target_file_bytes=1 << 30) == []

    def test_slack_suppresses_marginal_rewrites(self, fragmented):
        # target so small every dir "needs" many files -> nothing flagged
        assert plan_compaction(fragmented, target_file_bytes=1) == []


class TestCompact:
    def test_rows_preserved_files_bounded_untouched_dirs_identical(
        self, spark, fragmented
    ):
        before_rows = sorted(
            r["id"] for r in spark.read.parquet(fragmented).collect()
        )
        healthy = os.path.join(fragmented, "lang=b")
        healthy_before = _snapshot(healthy)

        done = compact_dataset(spark, fragmented, target_file_bytes=1 << 30)

        assert [os.path.basename(p.directory) for p in done] == ["lang=a"]
        frag = os.path.join(fragmented, "lang=a")
        assert len(_data_files(frag)) == 1  # 16 -> 1
        # O(change): the healthy directory was never rewritten
        assert _snapshot(healthy) == healthy_before
        after_rows = sorted(
            r["id"] for r in spark.read.parquet(fragmented).collect()
        )
        assert after_rows == before_rows

    def test_idempotent(self, spark, fragmented):
        compact_dataset(spark, fragmented, target_file_bytes=1 << 30)
        assert compact_dataset(spark, fragmented, target_file_bytes=1 << 30) == []
