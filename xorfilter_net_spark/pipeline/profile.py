"""One-pass column profiler — ANALYZE TABLE-style statistics for every
column in a single scan: row count, null count, exact NDV, an
HLL-estimated NDV (gated in-query against the exact value), and
type-appropriate min/max.

The Deequ/validate.py lesson applied to profiling: ALL columns'
statistics compile into ONE hash aggregate over ONE scan — the exact
count-distincts become Expand branches of the same aggregate (Catalyst
multiplies rows by branches map-side; nothing rescans), and the
approximate NDV (``approx_count_distinct``, Spark's JVM HLL++) rides in
the same pass. One aggregate row explodes into the per-column report.

Exact NDV at 10^12 rows is a real shuffle per column (that is what
"exact" costs — the Expand rows partition by value); the HLL estimate in
the same report is the O(registers) alternative, and the ``ndv_hll_ok``
gate documents its error against the exact value wherever both are
affordable. At full scale, call with ``exact_ndv=False`` to drop the
Expand branches and keep only the sketch estimate — the scan count stays
one either way.

min/max are value SELECTION, not arithmetic — no ulp surface: numeric
columns report as double, strings binary-collated as-is, other types
(timestamps, binaries) report NULL min/max and keep counts/NDV.

No reference counterpart (beyond-reference pipeline family; sibling of
pipeline/validate.py — profile describes, validate asserts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["profile_columns"]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    rsd: float = 0.05,
    exact_ndv: bool = True,
) -> DataFrame:
    """(col_name, n_rows, n_nulls, ndv, ndv_hll, ndv_hll_ok, min_num,
    max_num, min_str, max_str) — one row per profiled column, one scan
    total. ``ndv`` is NULL when ``exact_ndv=False``; the gate then
    degrades to NULL too (unknowable without the exact value)."""
    cols = columns if columns is not None else df.columns
    schema = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in cols if c not in schema]
    if missing:
        raise ValueError(f"unknown columns: {missing}")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.count(F.col(c)).alias(f"__nn{i}"))
        if exact_ndv:
            aggs.append(F.countDistinct(F.col(c)).alias(f"__ndv{i}"))
        aggs.append(
            F.approx_count_distinct(F.col(c), rsd).alias(f"__hll{i}")
        )
        dt = schema[c]
        if isinstance(dt, _NUMERIC):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__mn{i}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__mx{i}"))
        elif isinstance(dt, T.StringType):
            aggs.append(F.min(F.col(c)).alias(f"__smn{i}"))
            aggs.append(F.max(F.col(c)).alias(f"__smx{i}"))
    one = df.agg(*aggs)

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("long")
    structs = []
    for i, c in enumerate(cols):
        dt = schema[c]
        ndv = F.col(f"__ndv{i}") if exact_ndv else null_l
        # 6-sigma band of HLL++'s published relative standard deviation,
        # floored so tiny-NDV columns don't gate on rounding
        ok = (
            F.abs(F.col(f"__hll{i}") - ndv)
            <= F.greatest(F.lit(4), F.lit(6 * rsd) * ndv)
            if exact_ndv
            else F.lit(None).cast("boolean")
        )
        is_num = isinstance(dt, _NUMERIC)
        is_str = isinstance(dt, T.StringType)
        structs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").cast("long").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn{i}")).cast("long").alias(
                    "n_nulls"
                ),
                ndv.cast("long").alias("ndv"),
                F.col(f"__hll{i}").cast("long").alias("ndv_hll"),
                ok.alias("ndv_hll_ok"),
                (F.col(f"__mn{i}") if is_num else null_d).alias("min_num"),
                (F.col(f"__mx{i}") if is_num else null_d).alias("max_num"),
                (F.col(f"__smn{i}") if is_str else null_s).alias("min_str"),
                (F.col(f"__smx{i}") if is_str else null_s).alias("max_str"),
            )
        )
    return one.select(F.explode(F.array(*structs)).alias("r")).select("r.*")
