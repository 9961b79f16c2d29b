"""Streaming rolling-window distinct — maintain the per-period mergeable
state table (sketches/rolling.py) under an event stream, exactly once,
and answer "distinct keys in the trailing W periods" at any moment
without ever re-reading history.

Each micro-batch aggregates to per-period partial states (one corpus
pass over the BATCH only), which OR-merge into the persisted
(period, state) table — the same idempotent commit discipline as
streaming/ivm.py: versioned ``data_v{n}`` dirs, a ``view.json`` pointer
written LAST via atomic rename, the applied-batch ledger inside the
pointer (replayed foreachBatch ids skip; retries never double-apply —
and bitmap OR is idempotent anyway, a belt under the braces). State
table size is periods x state bytes, independent of event count.

The rolling answer is then pure state algebra over the maintained table
(``rolling_state_window``), identical to what the batch operator
computes from raw history — the parity the registered query's oracle
checks.

No reference counterpart (beyond-reference streaming family; composes
the north_rule's mergeable-UDAF contract with the streaming ledger).
"""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sketches.base import MergeableSketch, aggregate_by_group
from ..sketches.bitmap import BitmapSketch
from ..sketches.rolling import rolling_state_window

__all__ = [
    "init_period_store",
    "stream_update_period_states",
    "read_period_states",
    "rolling_from_store",
    "moment_anomalies_from_store",
]

_META = "view.json"


def _meta(store_dir: str) -> dict:
    with open(os.path.join(store_dir, _META)) as fh:
        return json.load(fh)


def _commit(store_dir: str, meta: dict) -> None:
    tmp = os.path.join(store_dir, _META + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh, indent=1)
    os.replace(tmp, os.path.join(store_dir, _META))


def init_period_store(spark: SparkSession, store_dir: str) -> None:
    """Empty (period, state) store, version 0."""
    os.makedirs(store_dir, exist_ok=True)
    spark.createDataFrame([], "period long, state binary").write.mode(
        "overwrite"
    ).parquet(os.path.join(store_dir, "data_v0"))
    _commit(store_dir, {"current": 0, "applied_batches": []})


def read_period_states(spark: SparkSession, store_dir: str) -> DataFrame:
    m = _meta(store_dir)
    return spark.read.parquet(
        os.path.join(store_dir, f"data_v{m['current']}")
    )


def _period_partials(
    batch: DataFrame,
    sketch: MergeableSketch,
    key_col: str,
    ts_col: str,
    period_seconds: int,
) -> DataFrame:
    e = batch.select(
        F.floor(
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            / F.lit(period_seconds * 1_000_000)
        ).alias("period"),
        F.col(key_col).alias("__k"),
    ).filter(F.col("__k").isNotNull() & F.col("period").isNotNull())
    return aggregate_by_group(e, ["period"], ["__k"], sketch)


def apply_batch(
    spark: SparkSession,
    store_dir: str,
    batch: DataFrame,
    batch_id: int,
    sketch: MergeableSketch,
    key_col: str,
    ts_col: str,
    period_seconds: int,
) -> dict:
    m = _meta(store_dir)
    if batch_id in m["applied_batches"]:
        return {"skipped_replay": True, "batch_id": batch_id}
    cur = m["current"]
    old = spark.read.parquet(os.path.join(store_dir, f"data_v{cur}"))
    new_partials = _period_partials(
        batch, sketch, key_col, ts_col, period_seconds
    )

    def merge_group(keys, pdf: pd.DataFrame) -> pd.DataFrame:
        st = sketch.zero()
        for blob in pdf["state"]:
            st = sketch.merge(st, sketch.deserialize(bytes(blob)))
        return pd.DataFrame(
            {"period": [keys[0]], "state": [sketch.serialize(st)]}
        )

    merged = (
        old.unionByName(new_partials)
        .groupBy("period")
        .applyInPandas(merge_group, schema="period long, state binary")
    )
    merged.write.mode("overwrite").parquet(
        os.path.join(store_dir, f"data_v{cur + 1}")
    )
    _commit(
        store_dir,
        {
            "current": cur + 1,
            "applied_batches": sorted(set(m["applied_batches"]) | {batch_id}),
        },
    )
    for d in os.listdir(store_dir):
        if d.startswith("data_v") and int(d[6:]) < cur:
            shutil.rmtree(os.path.join(store_dir, d), ignore_errors=True)
    return {"batch_id": batch_id, "version": cur + 1}


def stream_update_period_states(
    events_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    key_col: str,
    ts_col: str,
    capacity: int | None = None,
    period_seconds: int = 86400,
    trigger_once: bool = True,
    sketch: MergeableSketch | None = None,
):
    """Attach the maintainer to an event stream. The store must already
    be initialized (``init_period_store``). Default state is a bitmap
    over ``key_col`` (rolling distinct); pass any ``MergeableSketch``
    reading the ``__k`` column to maintain other per-period state — e.g.
    ``MomentSketch`` for the 3-sigma anomaly monitor."""
    spark = events_stream.sparkSession
    sk = sketch if sketch is not None else BitmapSketch(capacity, key_col="__k")

    def for_each(batch_df: DataFrame, batch_id: int) -> None:
        apply_batch(
            spark, store_dir, batch_df, batch_id, sk,
            key_col, ts_col, period_seconds,
        )

    writer = events_stream.writeStream.foreachBatch(for_each).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def rolling_from_store(
    spark: SparkSession,
    store_dir: str,
    capacity: int,
    window: int = 7,
) -> DataFrame:
    """(period, n_rolling) from the maintained store — state algebra
    only; no event history is read."""
    sk = BitmapSketch(capacity, key_col="__k")
    return rolling_state_window(
        read_period_states(spark, store_dir),
        sk,
        sk.estimate,
        window,
        out_col="n_rolling",
    )


def moment_anomalies_from_store(
    spark: SparkSession,
    store_dir: str,
    quant: int = 1000,
    window: int = 7,
    sigmas: int = 3,
) -> DataFrame:
    """The 3-sigma anomaly report from a MAINTAINED moment store — the
    streaming twin of ``relational/timeseries.py::
    rolling_moment_anomalies``, producing the identical rows (the
    registered query's oracle IS the batch operator's oracle).

    The store is periods-sized, so the flag arithmetic runs driver-side
    in arbitrary-precision Python ints — no decimal(38) envelope at all
    on this path. Event history is never re-read."""
    from ..sketches.moments import MomentSketch

    sk = MomentSketch(quant=quant)
    per = {
        int(r["period"]): sk.deserialize(bytes(r["state"]))
        for r in read_period_states(spark, store_dir).collect()
    }
    rows = []
    for p in sorted(per):
        n_d, s1_d, _ = per[p]
        N = S1 = S2 = 0
        for back in range(1, window + 1):
            if p - back in per:
                n, s1, s2 = per[p - back]
                N, S1, S2 = N + n, S1 + s1, S2 + s2
        if N == 0:
            flag = False
        else:
            flag = (s1_d * N - S1 * n_d) ** 2 > (
                sigmas * sigmas
            ) * n_d * n_d * (S2 * N - S1 * S1)
        rows.append((p, n_d, s1_d, N, S1, S2, bool(flag)))
    return spark.createDataFrame(
        rows,
        "period long, n_day long, sum_day_q long, n_prior long, "
        "sum_prior_q long, sumsq_prior_q long, is_anomaly boolean",
    )
