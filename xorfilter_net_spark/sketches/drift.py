"""Sketch-based data-drift report between two corpus snapshots.

The payoff of a mergeable-sketch library at 100 TB: comparing two
snapshots (yesterday/today, train/val, region A/B) should cost two
one-pass aggregates — never a re-read, never a corpus-vs-corpus join.
Each table folds into three tiny states; every drift number is then
driver-side arithmetic over the states:

- **key drift** (theta/KMV): distinct estimates for A and B plus their
  Jaccard via sketch-level set algebra (`sketches/theta.py` ∩/∪) —
  RSE ≤ 1/√(k-2) each (Beyer et al. SIGMOD'07);
- **numeric distribution drift** (KLL): a Kolmogorov-Smirnov estimate
  `max_x |rank_A(x) − rank_B(x)|` probed at both sketches' stored
  points — each rank is within the KLL rank-error ε, so the KS estimate
  is within 2ε of the true KS distance;
- **categorical frequency drift** (Misra-Gries): total-variation
  distance `½ Σ |p_A − p_B|` over the union of tracked keys — exact
  when each side's cardinality ≤ k (the MG exactness regime), an
  N/(k+1)-bounded estimate otherwise.

States are the same bytes `sketches/columns.py` materializes, so a
daily drift dashboard re-merges persisted states instead of touching
the corpus at all.

No reference counterpart (north_rule sketch-family composition).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from .base import aggregate
from .kll import KllSketch
from .misra_gries import MisraGriesSketch
from .theta import ThetaSketch

__all__ = ["drift_report", "snapshot_states", "drift_from_states"]


def _ks_estimate(kll: KllSketch, sa, sb) -> float:
    """max |rank_a(x) - rank_b(x)| over both sketches' support points."""
    va, _ = kll._weighted_items(sa)
    vb, _ = kll._weighted_items(sb)
    probes = np.unique(np.concatenate([va, vb]))
    if probes.size == 0:
        return 0.0
    return float(
        max(
            abs(kll.rank(sa, float(x)) - kll.rank(sb, float(x)))
            for x in probes
        )
    )


def _tv_estimate(fa: dict, fb: dict) -> float:
    na = sum(fa.values()) or 1
    nb = sum(fb.values()) or 1
    keys = set(fa) | set(fb)
    return 0.5 * sum(
        abs(fa.get(k, 0) / na - fb.get(k, 0) / nb) for k in keys
    )


def drift_report(
    df_a: DataFrame,
    df_b: DataFrame,
    key_col: str,
    num_col: str,
    cat_col: str,
    theta_k: int = 4096,
    kll_k: int = 200,
    mg_k: int = 256,
) -> dict:
    """One-pass-per-side drift report; all comparisons are state-level.

    Returns {distinct_a, distinct_b, key_jaccard, ks_distance,
    tv_distance} (floats; estimates within each sketch's published
    bound)."""
    theta = ThetaSketch(k=theta_k, key_col=key_col)
    kll = KllSketch(k=kll_k, value_col=num_col)
    mg = MisraGriesSketch(k=mg_k, key_col=cat_col)

    sa = snapshot_states(df_a, key_col, num_col, cat_col, theta, kll, mg)
    sb = snapshot_states(df_b, key_col, num_col, cat_col, theta, kll, mg)
    return drift_from_states(theta, kll, mg, sa, sb)


def snapshot_states(
    df: DataFrame,
    key_col: str,
    num_col: str,
    cat_col: str,
    theta: ThetaSketch,
    kll: KllSketch,
    mg: MisraGriesSketch,
) -> dict:
    """One pass over ``df`` -> the three drift states."""
    return {
        "theta": aggregate(df, [key_col], theta),
        "kll": aggregate(df, [num_col], kll),
        "mg": aggregate(df, [cat_col], mg),
    }


def drift_from_states(
    theta: ThetaSketch,
    kll: KllSketch,
    mg: MisraGriesSketch,
    sa: dict,
    sb: dict,
) -> dict:
    """Drift numbers from two state triples — pure driver arithmetic;
    the streaming monitor calls this per micro-batch on persisted
    states without ever touching the corpus."""
    inter = theta.intersection(sa["theta"], sb["theta"])
    union = theta.union_estimate(sa["theta"], sb["theta"])
    return {
        "distinct_a": theta.estimate(sa["theta"]),
        "distinct_b": theta.estimate(sb["theta"]),
        "key_jaccard": (inter / union) if union > 0 else 0.0,
        "ks_distance": _ks_estimate(kll, sa["kll"], sb["kll"]),
        "tv_distance": _tv_estimate(
            mg.finish(sa["mg"]), mg.finish(sb["mg"])
        ),
    }
