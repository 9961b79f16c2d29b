"""Dataset sinks: partitioned, size-targeted parquet output.

The write side of a training-data pipeline has two scale failure modes
the naive ``df.write.parquet(path)`` hits at 100 TB:

- *small files*: a 4,000-task stage writing into 50 partition values
  creates up to 200k files; downstream listing/open dominates reads.
- *giant skewed files*: one hot partition value funnels through however
  many tasks happen to hold it.

``write_dataset`` shapes the layout explicitly: it hash-repartitions on
(partition columns, a bounded file-bucket key) so each output directory
gets ``files_per_partition`` writer tasks regardless of upstream
parallelism or skew, then writes with ``partitionBy``. One shuffle,
deterministic layout, no driver-side collect. ``maxRecordsPerFile``
remains a backstop against any residual oversized bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_dataset(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    files_per_partition: int = 4,
    max_records_per_file: int = 5_000_000,
    mode: str = "overwrite",
    format: str = "parquet",
    options: dict | None = None,
) -> None:
    """Write ``df`` as a hive-partitioned dataset with a bounded,
    skew-proof file count per partition directory."""
    partition_cols = partition_cols or []
    # spread rows of each partition value over exactly N writer tasks;
    # xxhash64 over the whole row (monotonic id would serialize) keeps
    # the bucketing content-stable and shuffle-balanced
    bucket = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(files_per_partition)
    )
    shaped = df.repartition(*[F.col(c) for c in partition_cols], bucket)
    writer = (
        shaped.write.mode(mode)
        .format(format)
        .option("maxRecordsPerFile", str(max_records_per_file))
    )
    for key, val in (options or {}).items():
        writer = writer.option(key, val)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Write a bucketed (hash-clustered) table — the co-located-join
    layout for 100 TB fact tables.

    Bucketing persists the hash partitioning into the table metadata:
    two tables bucketed the same way on the join key satisfy each
    other's join distribution, so repeated joins/aggregations on that
    key run with ZERO shuffle of either side (asserted on the physical
    plan in tests). At 10^12 rows that turns every recurring
    fact-to-fact join from a full-corpus exchange into a local merge.
    ``sort_cols`` additionally sorts within each bucket file, enabling
    sort-merge joins without a sort stage. Requires ``saveAsTable``
    (bucket metadata lives in the catalog, not the parquet footers).
    """
    writer = (
        df.write.mode(mode)
        .format(format)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
