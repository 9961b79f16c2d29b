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
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.save(path)
