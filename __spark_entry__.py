"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``xorfilter_net_spark.entrypoints`` — the driver runs
``entry(spark)`` as a smoke check, each ``queries()[name]`` at sf=0.01,
and compares against ``oracle_sql()[name]`` via DuckDB (row-count +
schema + order-insensitive value-hash).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from xorfilter_net_spark import entrypoints  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return entrypoints.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(entrypoints.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(entrypoints.ORACLES)
