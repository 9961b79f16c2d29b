"""Distributed binary-fuse-filter construction and probing.

Same pipeline shape as the XOR build (``spark_build.py``, SURVEY §3.1):
executor-side vectorized digesting -> distributed digest dedup (uniform by
construction, skew-free) -> driver peel over 16-byte digests only ->
broadcast artifact, map-only vectorized probe. Only the core differs
(``fuse_core.py``: segmented addressing, ~1.125n slots).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

import numpy as np

from ..kernels.column import digest_series as _digest_batch
from .fuse_core import FuseFilter, build_fuse_from_digests
from .spark_build import key_digests

__all__ = ["build_fuse_filter", "is_member_fuse", "probe_fuse"]


def build_fuse_filter(
    df: DataFrame, key_col: str, width: int = 8, seed: int = 0
) -> FuseFilter:
    """Global fuse filter: distributed digest+dedup, driver peel."""
    uniq = key_digests(df, key_col).dropDuplicates(["d0", "d1"])
    pdf = uniq.toPandas()  # 16 bytes per *unique* key — the only collect
    d0 = pdf["d0"].to_numpy(dtype=np.int64).view(np.uint64)
    d1 = pdf["d1"].to_numpy(dtype=np.int64).view(np.uint64)
    return build_fuse_from_digests(d0, d1, width=width, seed=seed)


_FUSE_CACHE: dict[int, tuple[object, FuseFilter]] = {}


def _cached_fuse(art: dict) -> FuseFilter:
    k = id(art)
    hit = _FUSE_CACHE.get(k)
    if hit is None or hit[0] is not art:
        _FUSE_CACHE.clear()
        _FUSE_CACHE[k] = (art, FuseFilter.from_dict(art))
    return _FUSE_CACHE[k][1]


def is_member_fuse(
    spark: SparkSession, ff: FuseFilter, col: Column | str
) -> Column:
    """Vectorized membership probe column against a broadcast fuse filter."""
    bc = spark.sparkContext.broadcast(ff.to_dict())

    @pandas_udf("boolean")
    def _probe(s: pd.Series) -> pd.Series:
        f = _cached_fuse(bc.value)
        d0, d1 = _digest_batch(s)
        return pd.Series(f.contains_digests(d0, d1))

    return _probe(F.col(col) if isinstance(col, str) else col)


def probe_fuse(
    df: DataFrame, ff: FuseFilter, key_col: str, out: str = "is_member"
) -> DataFrame:
    return df.withColumn(out, is_member_fuse(df.sparkSession, ff, key_col))
