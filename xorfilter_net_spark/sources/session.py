"""SparkSession + table helpers shared by queries, tests and bench.

Scale posture: AQE on (runtime skew-join + partition coalescing), Arrow
transfers on (every UDF in this library is a vectorized pandas UDF),
session TZ pinned to UTC so timestamp semantics match the DuckDB oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def get_spark(
    master: str | None = None,
    app_name: str = "xorfilter-net-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    # 2x cores: a one-wave stage (partitions == cores) is serialized by
    # any single straggler; two waves re-balance around it
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", str(2 * int(cpus)))
    )
    return (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # always use the sort-based shuffle writer: the bypass-merge
        # writer opens one spill file per reduce partition per map task
        # (16k+ streams for a 128x128 exchange) and collapses under high
        # local thread counts — measured 2.4-10x slower at local[32]
        .config("spark.shuffle.sort.bypassMergeThreshold", "1")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .getOrCreate()
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (sf-scoped)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
