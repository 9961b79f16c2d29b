"""Streaming drift monitor — per-micro-batch drift vs a frozen reference.

The production use of the sketch-drift machinery: freeze a reference
snapshot's three states once, then fold every arriving micro-batch into
RUNNING states and emit the drift numbers after each batch — data-drift
alerting over an unbounded stream with O(sketch) state, no corpus
retention, no re-reads.

Mechanics (same discipline as ``streaming/incremental.py``):
- each micro-batch is aggregated DISTRIBUTED (the same two-phase
  mergeable aggregate as batch mode) and merged into the stored states;
- states + the applied-batch ledger persist atomically (tmp+rename) per
  batch, so a replayed ``batch_id`` after a crash is skipped — the
  running states are exactly-once;
- a JSONL metrics log appends one drift row per applied batch — the
  alerting surface.

Batch==stream parity (tested): after consuming slices s0..sn, the
running states equal ``snapshot_states(union(s0..sn))`` up to each
sketch's merge contract, so the final drift row matches the batch
``drift_report`` within the same bounds (theta/MG exactly in their
exact regimes; KLL within rank error).
"""

from __future__ import annotations

import json
import os
import pickle

from pyspark.sql import DataFrame

from ..sketches.drift import drift_from_states
from ..sketches.kll import KllSketch
from ..sketches.misra_gries import MisraGriesSketch
from ..sketches.theta import ThetaSketch

__all__ = ["DriftMonitor", "run_drift_monitor"]


def _atomic_write(path: str, blob: bytes) -> None:
    """tmp+rename commit — the same discipline incremental.py uses."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


class DriftMonitor:
    def __init__(
        self,
        ref_states: dict,
        key_col: str,
        num_col: str,
        cat_col: str,
        state_dir: str,
        theta_k: int = 4096,
        kll_k: int = 200,
        mg_k: int = 256,
    ):
        self.theta = ThetaSketch(k=theta_k, key_col=key_col)
        self.kll = KllSketch(k=kll_k, value_col=num_col)
        self.mg = MisraGriesSketch(k=mg_k, key_col=cat_col)
        self.cols = (key_col, num_col, cat_col)
        self.ref = ref_states
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    # -- persistence ------------------------------------------------------
    def _paths(self):
        return (
            os.path.join(self.state_dir, "states.pkl"),
            os.path.join(self.state_dir, "metrics.jsonl"),
        )

    def load(self) -> tuple[dict, set]:
        sp, _ = self._paths()
        if not os.path.exists(sp):
            return (
                {
                    "theta": self.theta.zero(),
                    "kll": self.kll.zero(),
                    "mg": self.mg.zero(),
                },
                set(),
            )
        with open(sp, "rb") as f:
            blob = pickle.load(f)
        return blob["states"], set(blob["applied"])

    def store(self, states: dict, applied: set) -> None:
        sp, _ = self._paths()
        _atomic_write(sp, pickle.dumps({"states": states, "applied": sorted(applied)}))

    # -- per-batch --------------------------------------------------------
    def merge_batch(self, batch_df: DataFrame, batch_id: int) -> dict | None:
        from ..sketches.drift import snapshot_states

        states, applied = self.load()
        if batch_id in applied:
            return None  # exactly-once on replay
        part = snapshot_states(
            batch_df, *self.cols, self.theta, self.kll, self.mg
        )
        states = {
            "theta": self.theta.merge(states["theta"], part["theta"]),
            "kll": self.kll.merge(states["kll"], part["kll"]),
            "mg": self.mg.merge(states["mg"], part["mg"]),
        }
        drift = drift_from_states(
            self.theta, self.kll, self.mg, states, self.ref
        )
        drift["batch_id"] = batch_id
        applied.add(batch_id)
        self.store(states, applied)
        _, mp = self._paths()
        with open(mp, "a") as f:
            f.write(json.dumps(drift) + "\n")
        return drift

    def metrics(self) -> list[dict]:
        _, mp = self._paths()
        if not os.path.exists(mp):
            return []
        with open(mp) as f:
            return [json.loads(line) for line in f if line.strip()]


def run_drift_monitor(
    stream_df: DataFrame,
    reference_df: DataFrame,
    key_col: str,
    num_col: str,
    cat_col: str,
    state_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Start the monitor: reference states are frozen from
    ``reference_df`` (one pass), then each micro-batch updates the
    running states and appends a drift row. Returns (query, monitor)."""
    from ..sketches.drift import snapshot_states

    mon = DriftMonitor(
        ref_states=None, key_col=key_col, num_col=num_col, cat_col=cat_col,
        state_dir=state_dir,
    )
    mon.ref = snapshot_states(
        reference_df, key_col, num_col, cat_col, mon.theta, mon.kll, mon.mg
    )

    def for_each(batch_df: DataFrame, batch_id: int) -> None:
        mon.merge_batch(batch_df, batch_id)

    writer = stream_df.writeStream.foreachBatch(for_each).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start(), mon
