"""Distributed ribbon-filter construction and probing.

Same pipeline shape as the XOR/fuse builds (``spark_build.py``, SURVEY
§3.1): executor-side vectorized digesting -> distributed digest dedup ->
driver banded-GF(2) solve over 16-byte digests only -> broadcast
artifact, map-only vectorized probe. Only the core differs
(``ribbon.py``: banded linear system, ~1.05n slots — the family's
space-optimal point, for broadcast-size-constrained deployments).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..kernels.column import digest_series as _digest_batch
from .ribbon import RibbonFilter, build_ribbon_from_digests
from .spark_build import key_digests

__all__ = ["build_ribbon_filter", "is_member_ribbon", "probe_ribbon"]


def build_ribbon_filter(
    df: DataFrame, key_col: str, width: int = 8, seed: int = 0
) -> RibbonFilter:
    """Global ribbon filter: distributed digest+dedup, driver solve."""
    uniq = key_digests(df, key_col).dropDuplicates(["d0", "d1"])
    pdf = uniq.toPandas()  # 16 bytes per *unique* key — the only collect
    d0 = pdf["d0"].to_numpy(dtype=np.int64).view(np.uint64)
    d1 = pdf["d1"].to_numpy(dtype=np.int64).view(np.uint64)
    return build_ribbon_from_digests(d0, d1, width=width, seed=seed)


_RIBBON_CACHE: dict[int, tuple[object, RibbonFilter]] = {}


def _cached_ribbon(art: dict) -> RibbonFilter:
    k = id(art)
    hit = _RIBBON_CACHE.get(k)
    if hit is None or hit[0] is not art:
        _RIBBON_CACHE.clear()
        _RIBBON_CACHE[k] = (art, RibbonFilter.from_dict(art))
    return _RIBBON_CACHE[k][1]


def is_member_ribbon(
    spark: SparkSession, rf: RibbonFilter, col: Column | str
) -> Column:
    """Vectorized membership probe column against a broadcast ribbon
    filter (64 masked gathers per Arrow batch — the probe-cost side of
    ribbon's space/compute trade)."""
    bc = spark.sparkContext.broadcast(rf.to_dict())

    @pandas_udf("boolean")
    def _probe(s: pd.Series) -> pd.Series:
        f = _cached_ribbon(bc.value)
        d0, d1 = _digest_batch(s)
        return pd.Series(f.contains_digests(d0, d1))

    return _probe(F.col(col) if isinstance(col, str) else col)


def probe_ribbon(
    df: DataFrame, rf: RibbonFilter, key_col: str, out: str = "is_member"
) -> DataFrame:
    return df.withColumn(out, is_member_ribbon(df.sparkSession, rf, key_col))
