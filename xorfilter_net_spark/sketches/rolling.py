"""Rolling-window distinct counts from per-period mergeable states —
"distinct users in the trailing 7 days, for every day" at corpus scale.

The naive formulation is notorious: window functions cannot express
COUNT(DISTINCT) over a moving frame, and the self-join + re-count
approach rescans W days of raw events for every output day (W× the
corpus per sweep). The mergeable-state formulation does it in one pass
+ state algebra:

  1. ONE corpus-sized aggregate builds a state per period
     (``aggregate_by_group`` — map-side combined, shuffle carries keys
     once);
  2. each period's state fans out to the W windows it participates in
     (``explode(sequence(p, p+W-1))`` — W small rows per PERIOD, not
     per event);
  3. per-window merge + finish in ``applyInPandas`` — W state blobs in,
     one integer out.

With ``BitmapSketch`` states the rolling distinct is EXACT (OR-merge
loses nothing); swap in ``HllSketch``/``ThetaSketch`` for unbounded key
domains and the same plan yields the approximate variant — the operator
is generic over the repo's MergeableSketch protocol. Raw events are
read exactly once either way; sweep cost after that is
O(periods × W × state_size), independent of corpus size.

No reference counterpart (north_rule sketch family applied as a window
engine).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .base import MergeableSketch, aggregate_by_group
from .bitmap import BitmapSketch

__all__ = [
    "rolling_state_window",
    "rolling_distinct_exact",
    "rolling_topk_mg",
    "rolling_quantile_kll",
]


def rolling_state_window(
    period_states: DataFrame,
    sketch: MergeableSketch,
    finish,
    window: int,
    period_col: str = "period",
    out_col: str = "value",
) -> DataFrame:
    """(period, out_col) for every period present in ``period_states``
    (a ``(period, state binary)`` table): ``finish(merge(states of
    [period-window+1, period]))``. Trailing windows at the start of the
    data contain fewer periods, as a trailing window should."""
    if window < 1:
        raise ValueError("window must be >= 1")
    contrib = period_states.select(
        F.explode(
            F.sequence(
                F.col(period_col), F.col(period_col) + (window - 1)
            )
        ).alias("__target"),
        "state",
    )
    # only emit windows anchored at a period that actually exists
    anchors = period_states.select(
        F.col(period_col).alias("__target")
    ).distinct()
    src = contrib.join(anchors, "__target", "left_semi")

    def merge_group(keys, pdf: pd.DataFrame) -> pd.DataFrame:
        st = sketch.zero()
        for blob in pdf["state"]:
            st = sketch.merge(st, sketch.deserialize(bytes(blob)))
        return pd.DataFrame(
            {period_col: [keys[0]], out_col: [finish(st)]}
        )

    return src.groupBy("__target").applyInPandas(
        merge_group, schema=f"{period_col} long, {out_col} long"
    )


def rolling_topk_mg(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    k: int = 256,
    window: int = 7,
    period_seconds: int = 86400,
    top: int | None = None,
) -> DataFrame:
    """(period, key, est_count) — the trailing-``window`` frequency
    table per active period, from per-period Misra-Gries states. The
    frequency twin of ``rolling_distinct_exact``: same one-pass +
    explode-fanout + per-window merge plan, but the window answer is a
    whole (key, count) table instead of one integer.

    MG merge is counter addition + shrink (Mergeable Summaries), so
    per-window estimates carry the usual [true - N_w/(k+1), true] bound
    where N_w is the WINDOW's row count; when distinct keys per window
    never exceed ``k`` no shrink fires anywhere and every count is EXACT
    — the regime the registered query's value-exact oracle pins.
    ``top`` truncates each window's table to its ``top`` most frequent
    keys (count desc, key asc — deterministic)."""
    from .misra_gries import MisraGriesSketch

    if period_seconds <= 0:
        raise ValueError("period_seconds must be positive")
    if window < 1:
        raise ValueError("window must be >= 1")
    sk = MisraGriesSketch(k=k, key_col="__k")
    e = events.select(
        F.floor(
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            / F.lit(period_seconds * 1_000_000)
        ).alias("period"),
        F.col(key_col).cast("string").alias("__k"),
    ).filter(F.col("__k").isNotNull() & F.col("period").isNotNull())
    states = aggregate_by_group(e, ["period"], ["__k"], sk)
    contrib = states.select(
        F.explode(
            F.sequence(F.col("period"), F.col("period") + (window - 1))
        ).alias("__target"),
        "state",
    )
    anchors = states.select(F.col("period").alias("__target")).distinct()
    src = contrib.join(anchors, "__target", "left_semi")

    def merge_group(keys, pdf: pd.DataFrame) -> pd.DataFrame:
        st = sk.zero()
        for blob in pdf["state"]:
            st = sk.merge(st, sk.deserialize(bytes(blob)))
        items = sorted(
            sk.finish(st).items(), key=lambda kv: (-kv[1], str(kv[0]))
        )
        if top is not None:
            items = items[:top]
        return pd.DataFrame(
            {
                "period": [keys[0]] * len(items),
                "key": [str(key) for key, _ in items],
                "est_count": [int(c) for _, c in items],
            }
        )

    return src.groupBy("__target").applyInPandas(
        merge_group, schema="period long, key string, est_count long"
    )


def rolling_distinct_exact(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    capacity: int,
    window: int = 7,
    period_seconds: int = 86400,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(group..., period, n_rolling) — EXACT distinct ``key_col``
    values in the trailing ``window`` periods ending at each of the
    group's active periods, via per-(group, period) bitmap states.
    ``group_cols=None`` gives the global roll-up (one state stream)."""
    if period_seconds <= 0:
        raise ValueError("period_seconds must be positive")
    if window < 1:
        raise ValueError("window must be >= 1")
    gcols = list(group_cols or [])
    sk = BitmapSketch(capacity, key_col="__k")
    e = events.select(
        *gcols,
        F.floor(
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            / F.lit(period_seconds * 1_000_000)
        ).alias("period"),
        F.col(key_col).alias("__k"),
    ).filter(F.col("__k").isNotNull() & F.col("period").isNotNull())
    for g in gcols:
        e = e.filter(F.col(g).isNotNull())
    states = aggregate_by_group(e, gcols + ["period"], ["__k"], sk)
    if not gcols:
        return rolling_state_window(
            states, sk, sk.estimate, window, out_col="n_rolling"
        )
    # grouped fan-out: a (group, period) state serves the group's own
    # next W windows; anchors are the group's active periods
    contrib = states.select(
        *gcols,
        F.explode(
            F.sequence(F.col("period"), F.col("period") + (window - 1))
        ).alias("__target"),
        "state",
    )
    anchors = states.select(
        *gcols, F.col("period").alias("__target")
    ).distinct()
    src = contrib.join(anchors, gcols + ["__target"], "left_semi")
    gschema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in states.select(*gcols).schema.fields
    )

    def merge_group(keys, pdf: pd.DataFrame) -> pd.DataFrame:
        st = sk.zero()
        for blob in pdf["state"]:
            st = sk.merge(st, sk.deserialize(bytes(blob)))
        row = {c: [k] for c, k in zip(gcols, keys[:-1])}
        row["period"] = [keys[-1]]
        row["n_rolling"] = [sk.estimate(st)]
        return pd.DataFrame(row)

    return src.groupBy(*gcols, "__target").applyInPandas(
        merge_group,
        schema=f"{gschema}, period long, n_rolling long",
    )


def rolling_quantile_kll(
    events: DataFrame,
    value_col: str,
    ts_col: str,
    qs: tuple[float, ...] = (0.5, 0.95),
    k: int = 200,
    window: int = 7,
    period_seconds: int = 86400,
) -> DataFrame:
    """(period, q_e6, est_value) — trailing-``window`` quantile
    estimates per active period, from per-period KLL states. Completes
    the rolling state-algebra family (distinct / top-k / moments /
    quantiles): the same one-pass + explode-fanout + per-window merge
    plan, sweep cost O(periods x window x state) independent of corpus
    size; KLL merge keeps the published rank-error bound under
    arbitrary merge trees (Mergeable Summaries), which the registered
    query's rank-band referee checks per window."""
    from .kll import KllSketch

    if period_seconds <= 0:
        raise ValueError("period_seconds must be positive")
    if window < 1:
        raise ValueError("window must be >= 1")
    sk = KllSketch(k=k, value_col="__v")
    e = events.select(
        F.floor(
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            / F.lit(period_seconds * 1_000_000)
        ).alias("period"),
        F.col(value_col).cast("double").alias("__v"),
    ).filter(F.col("__v").isNotNull() & F.col("period").isNotNull())
    states = aggregate_by_group(e, ["period"], ["__v"], sk)
    contrib = states.select(
        F.explode(
            F.sequence(F.col("period"), F.col("period") + (window - 1))
        ).alias("__target"),
        "state",
    )
    anchors = states.select(F.col("period").alias("__target")).distinct()
    src = contrib.join(anchors, "__target", "left_semi")
    q_list = [float(q) for q in qs]

    def merge_group(keys, pdf: pd.DataFrame) -> pd.DataFrame:
        st = sk.zero()
        for blob in pdf["state"]:
            st = sk.merge(st, sk.deserialize(bytes(blob)))
        return pd.DataFrame(
            {
                "period": [keys[0]] * len(q_list),
                "q_e6": [int(round(q * 1_000_000)) for q in q_list],
                "est_value": [float(sk.quantile(st, q)) for q in q_list],
            }
        )

    return src.groupBy("__target").applyInPandas(
        merge_group, schema="period long, q_e6 long, est_value double"
    )
