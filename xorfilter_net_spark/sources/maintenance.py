"""Dataset maintenance: small-file compaction, O(change) not O(corpus).

Streaming/incremental writers (micro-batches, merge deltas, per-trigger
appends) accrete small files; at 100 TB the read-side cost is file
listing + one open/footer-parse per file, which eventually dominates the
scan itself. The standard fix is a compaction pass (Delta OPTIMIZE /
Iceberg rewrite_data_files); this module implements the same contract on
plain hive-partitioned parquet:

- **Planning is metadata-only**: one filesystem listing, no data read.
  A partition directory is flagged only when its file count exceeds what
  its byte size needs (``ceil(bytes / target_file_bytes)``, with slack).
- **Rewrite touches only flagged directories**: each is read, coalesced
  to its target file count, written beside the original and atomically
  swapped in. Healthy directories are never opened — their files stay
  byte-identical (asserted in tests), so incremental consumers keyed on
  file identity (streaming file sources, manifest caches) do not
  re-ingest them.
- Each directory rewrite is an independent Spark job over just that
  directory's bytes — on a cluster the rewrites are executor-parallel
  and the total work is O(flagged bytes).

Reference parity: no counterpart (the reference is an in-memory filter
library); this is engine-side data-layout maintenance mandated by the
training-pipeline scope (SURVEY.md §2.3a).
"""

from __future__ import annotations

import math
import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass
class CompactionPlan:
    """One flagged partition directory."""

    directory: str
    n_files: int
    total_bytes: int
    target_files: int


def _leaf_parquet_dirs(root: str) -> list[str]:
    """Directories directly containing parquet data files."""
    out = []
    for dirpath, _dirnames, filenames in os.walk(root):
        if any(
            f.endswith(".parquet") and not f.startswith((".", "_"))
            for f in filenames
        ):
            out.append(dirpath)
    return sorted(out)


def _data_files(d: str) -> list[str]:
    return sorted(
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )


def plan_compaction(
    root: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    slack: float = 1.5,
) -> list[CompactionPlan]:
    """Metadata-only planning pass: flag every leaf partition directory
    whose file count exceeds ``slack ×`` the count its bytes justify.
    ``slack`` keeps marginally-fragmented directories (whose rewrite
    would churn bytes for little listing benefit) untouched."""
    plans = []
    for d in _leaf_parquet_dirs(root):
        files = _data_files(d)
        total = sum(os.path.getsize(f) for f in files)
        target = max(1, math.ceil(total / target_file_bytes))
        if len(files) > math.ceil(target * slack):
            plans.append(CompactionPlan(d, len(files), total, target))
    return plans


def compact_dataset(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    slack: float = 1.5,
    verify_counts: bool = True,
) -> list[CompactionPlan]:
    """Compact flagged directories in place; returns the executed plan.

    Per directory: read -> repartition(target_files) -> write to a
    sibling temp dir -> verify row count (optional, one cheap count over
    the rewritten bytes) -> swap data files atomically-enough for a
    single-writer maintenance window (the parquet files are replaced in
    one rename sequence; concurrent readers of plain parquet dirs have
    no snapshot isolation either way — a table format supplies that)."""
    executed = []
    for plan in plan_compaction(root, target_file_bytes, slack):
        src = plan.directory
        tmp = f"{src}.__compact_{uuid.uuid4().hex[:8]}"
        df = spark.read.parquet(src)
        n_before = df.count() if verify_counts else None
        df.repartition(plan.target_files).write.mode("overwrite").parquet(tmp)
        if verify_counts:
            n_after = spark.read.parquet(tmp).count()
            if n_after != n_before:
                shutil.rmtree(tmp, ignore_errors=True)
                raise RuntimeError(
                    f"compaction row-count mismatch in {src}: "
                    f"{n_before} -> {n_after}"
                )
        for f in _data_files(src):
            os.remove(f)
        for f in _data_files(tmp):
            shutil.move(f, os.path.join(src, os.path.basename(f)))
        shutil.rmtree(tmp, ignore_errors=True)
        executed.append(plan)
    return executed
