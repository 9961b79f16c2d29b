"""Time-series resampling operators — fixed-interval OHLC downsampling
and calendar gap-filling with forward fill (LOCF), the two workhorses of
event-stream -> regular-grid conversion (metrics pipelines, feature
stores, financial bars).

Buckets are INTEGER epoch-interval indexes (``floor(epoch_us /
interval_us)``) — pure integer arithmetic, no calendar/timezone surface,
identical in any engine (the repo's standing convention, cf.
relational/cohort.py).

``resample_ohlc``: one hash aggregate — open/close are ``min_by`` /
``max_by`` over a (epoch_us, tiebreak) struct key (total order, so
ties are deterministic), high/low/count ride in the same pass. All
selection, no arithmetic: doubles pass through bit-identically. The
registered query's oracle computes open/close via row_number windows
instead — two different machineries agreeing value-for-value.

``gapfill_forward``: per-key daily counts densified onto the full
[first-active-day, global-last-day] grid (``explode(sequence(...))`` —
rows-per-key bounded by the calendar length, not the event count) and
forward-filled with ``last(ignorenulls)`` over a cumulative ROWS frame
(O(1) window state). The only corpus-sized shuffle is the initial daily
aggregate (map-side combined); the grid join is key-co-partitioned with
it.

No reference counterpart (beyond-reference analytics family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "resample_ohlc",
    "gapfill_forward",
    "rolling_moment_anomalies",
    "grouped_trend",
]


def _epoch_us(ts_col: str):
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def resample_ohlc(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    interval_seconds: int = 21600,
) -> DataFrame:
    """(key, bucket, open, high, low, close, n) per (key, fixed
    interval); open/close = value at the earliest/latest (ts, tiebreak)
    within the bucket. NULL values/timestamps are excluded (a bar needs
    a price)."""
    if interval_seconds <= 0:
        raise ValueError("interval_seconds must be positive")
    e = events.select(
        F.col(key_col).alias("key"),
        _epoch_us(ts_col).alias("t"),
        F.col(value_col).alias("v"),
        F.col(tiebreak_col).alias("tb"),
    ).filter(F.col("v").isNotNull() & F.col("t").isNotNull())
    ord_key = F.struct("t", "tb")
    return (
        e.groupBy(
            "key",
            F.floor(
                F.col("t") / F.lit(interval_seconds * 1_000_000)
            ).alias("bucket"),
        )
        .agg(
            F.min_by("v", ord_key).alias("open"),
            F.max("v").alias("high"),
            F.min("v").alias("low"),
            F.max_by("v", ord_key).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def gapfill_forward(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    period_seconds: int = 86400,
) -> DataFrame:
    """(key, period, n_filled) — per-key event counts on the dense
    period grid from the key's first active period to the CORPUS's last,
    missing periods carrying the last observed count forward (LOCF).
    The first period of every key has data by construction, so no
    leading NULLs survive."""
    if period_seconds <= 0:
        raise ValueError("period_seconds must be positive")
    e = events.select(
        F.col(key_col).alias("key"),
        F.floor(
            _epoch_us(ts_col) / F.lit(period_seconds * 1_000_000)
        ).alias("period"),
    ).filter(F.col("key").isNotNull() & F.col("period").isNotNull())
    daily = e.groupBy("key", "period").agg(F.count(F.lit(1)).alias("n"))
    span = daily.groupBy("key").agg(F.min("period").alias("p0"))
    gmax = daily.agg(F.max("period").alias("p1"))
    cal = (
        span.crossJoin(F.broadcast(gmax))
        .select("key", F.explode(F.sequence("p0", "p1")).alias("period"))
    )
    w = (
        Window.partitionBy("key")
        .orderBy("period")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cal.join(daily, ["key", "period"], "left")
        .select(
            "key",
            "period",
            F.last("n", ignorenulls=True).over(w).alias("n_filled"),
        )
    )


def rolling_moment_anomalies(
    events: DataFrame,
    value_col: str,
    ts_col: str,
    window: int = 7,
    period_seconds: int = 86400,
    sigmas: int = 3,
    quant: int = 1000,
) -> DataFrame:
    """Exact 3-sigma anomaly flags per period: does each period's mean
    value deviate from the PRIOR ``window`` periods' population mean by
    more than ``sigmas`` standard deviations?

    Entirely whole-stage codegen — no Python, no floats, no sqrt:
    values quantize to milli-units (``floor(v*quant)``, one IEEE op,
    identical cross-engine), per-period (n, sum, sumsq) moment rows are
    the mergeable state (plain integer addition — the degenerate
    mergeable sketch), each period's moments fan out to the ``window``
    FOLLOWING periods they are "prior context" for, and the sigma test
    is cross-multiplied into one integer comparison::

        (s1_d*N - S1*n_d)^2  >  sigmas^2 * n_d^2 * (S2*N - S1^2)

    (divide both sides by n_d^2*N^2 to recover the familiar
    ``(mean_day - mean_prior)^2 > sigmas^2 * var_prior`` form)

    evaluated in decimal(38,0) (hugeint in the DuckDB oracle) so no
    division or sqrt ever runs — both sides exact, flag deterministic.
    Periods with an empty prior window flag false (no evidence).

    Scale: ONE corpus-sized aggregate; the fanout/compare stages are
    periods-sized. The decimal(38) envelope holds while
    ``(sum*N)^2 < 10^38`` — comfortable for daily windows at
    milli-quantization (pre-scale ``quant`` down for pathological
    magnitudes)."""
    if window < 1:
        raise ValueError("window must be >= 1")
    if period_seconds <= 0:
        raise ValueError("period_seconds must be positive")
    per = events.select(
        F.floor(
            _epoch_us(ts_col) / F.lit(period_seconds * 1_000_000)
        ).alias("period"),
        F.expr(
            f"cast(floor(cast({value_col} as double) * {quant}) as bigint)"
        ).alias("q"),
    ).filter(F.col("q").isNotNull() & F.col("period").isNotNull())
    day = per.groupBy("period").agg(
        F.count(F.lit(1)).alias("n_day"),
        F.sum("q").alias("sum_day_q"),
        F.sum(F.expr("q * q")).alias("sumsq_day_q"),
    )
    prior_contrib = day.select(
        F.explode(
            F.sequence(F.col("period") + 1, F.col("period") + window)
        ).alias("p"),
        "n_day",
        "sum_day_q",
        "sumsq_day_q",
    )
    prior = prior_contrib.groupBy("p").agg(
        F.sum("n_day").alias("n_prior"),
        F.sum("sum_day_q").alias("sum_prior_q"),
        F.sum("sumsq_day_q").alias("sumsq_prior_q"),
    )
    j = day.join(prior, day["period"] == prior["p"], "left").select(
        "period",
        "n_day",
        "sum_day_q",
        F.coalesce("n_prior", F.lit(0)).alias("n_prior"),
        F.coalesce("sum_prior_q", F.lit(0)).alias("sum_prior_q"),
        F.coalesce("sumsq_prior_q", F.lit(0)).alias("sumsq_prior_q"),
    )
    d = "cast({} as decimal(38,0))"
    lhs = (
        f"(({d.format('sum_day_q')} * n_prior - "
        f"{d.format('sum_prior_q')} * n_day) * "
        f"({d.format('sum_day_q')} * n_prior - "
        f"{d.format('sum_prior_q')} * n_day))"
    )
    rhs = (
        f"{sigmas * sigmas} * ({d.format('n_day')} * n_day) * "
        f"({d.format('sumsq_prior_q')} * n_prior - "
        f"{d.format('sum_prior_q')} * {d.format('sum_prior_q')})"
    )
    return j.withColumn(
        "is_anomaly",
        F.expr(f"case when n_prior = 0 then false else {lhs} > {rhs} end"),
    )


def grouped_trend(
    events: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    y_quant: int = 1000,
    x_origin_us: int | None = None,
    x_unit_us: int = 3_600_000_000,
) -> DataFrame:
    """Per-group OLS trend line as EXACT integer rationals — "is this
    metric drifting up or down per group" without a single float.

    Closed-form simple regression needs only five mergeable integer
    moments per group: (n, Σx, Σy, Σxx, Σxy). One map-side-combined
    hash aggregate computes them; the slope/intercept are returned as
    (numerator, denominator) pairs::

        slope     = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²)
        intercept = (Σy·Σxx − Σx·Σxy) / (n·Σxx − Σx²)

    with the division LEFT TO THE CONSUMER (the repo's standing
    convention for cross-engine exactness — cf. TF-IDF, PMI). The
    numerators/denominator are evaluated in decimal(38,0) (hugeint in
    the oracle). x is the event time in coarse integer units
    (``(epoch_us − origin) / x_unit_us``, hours by default) measured
    from the corpus's own min timestamp unless pinned — keeping Σxx
    small enough that the decimal envelope holds for ~10^9 rows/group
    at hour resolution over a year. y quantizes to milli-units.

    ``sign(slope_num) * sign(den)`` is the drift direction; groups with
    a degenerate x spread (den = 0: <2 distinct x) emit NULL rationals.
    """
    e = events.select(
        F.col(group_col).alias("g"),
        F.col(x_col).alias("__ts"),
        F.expr(
            f"cast(floor(cast({y_col} as double) * {y_quant}) as bigint)"
        ).alias("y"),
    ).filter(
        F.col("g").isNotNull()
        & F.col("__ts").isNotNull()
        & F.col("y").isNotNull()
    )
    if x_origin_us is None:
        x_origin_us = int(
            e.agg(
                F.min(F.unix_micros(F.col("__ts").cast("timestamp")))
            ).collect()[0][0]
            or 0
        )
    # integer `div`, not float floor: x >= 0 by origin choice, and the
    # oracle replays the identical integer op (no double in the path)
    x = F.expr(
        f"(unix_micros(cast(__ts as timestamp)) - {x_origin_us}) "
        f"div {x_unit_us}"
    )
    m = (
        e.select("g", x.cast("long").alias("x"), "y")
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.expr("x * x")).alias("sxx"),
            F.sum(F.expr("x * y")).alias("sxy"),
        )
    )
    d = "cast({} as decimal(38,0))"
    den = f"({d.format('n')} * sxx - {d.format('sx')} * sx)"
    slope_num = f"({d.format('n')} * sxy - {d.format('sx')} * sy)"
    icpt_num = f"({d.format('sy')} * sxx - {d.format('sx')} * sxy)"
    return m.select(
        F.col("g").alias(group_col),
        "n",
        "sx",
        "sy",
        "sxx",
        "sxy",
        F.expr(
            f"case when {den} = 0 then null else cast({slope_num} as long) end"
        ).alias("slope_num"),
        F.expr(
            f"case when {den} = 0 then null else cast({icpt_num} as long) end"
        ).alias("intercept_num"),
        F.expr(
            f"case when {den} = 0 then null else cast({den} as long) end"
        ).alias("den"),
    )
