"""Sketch-based drift report (sketches/drift.py) — unit invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from xorfilter_net_spark.sketches.drift import drift_report


def _snap(spark, n, key_off=0, val_scale=1.0, types=("a", "b")):
    return spark.range(n).select(
        (F.col("id") + key_off).alias("k"),
        (F.col("id").cast("double") * val_scale).alias("v"),
        F.when(F.col("id") % 2 == 0, types[0])
        .otherwise(types[1])
        .alias("c"),
    )


def test_identical_snapshots_report_zero_drift(spark):
    a = _snap(spark, 400)
    rep = drift_report(a, _snap(spark, 400), "k", "v", "c")
    assert abs(rep["key_jaccard"] - 1.0) < 1e-9
    assert rep["ks_distance"] < 1e-9
    assert rep["tv_distance"] < 1e-9
    assert abs(rep["distinct_a"] - 400) < 1e-9


def test_disjoint_keys_and_shifted_values(spark):
    a = _snap(spark, 300)
    b = _snap(spark, 300, key_off=1000, val_scale=3.0)
    rep = drift_report(a, b, "k", "v", "c")
    assert rep["key_jaccard"] == 0.0
    # value supports overlap only on [0, 299] vs [0, 897] scaled:
    # CDFs diverge substantially -> KS well above noise
    assert rep["ks_distance"] > 0.4
    assert rep["tv_distance"] < 1e-9  # same 50/50 categorical mix


def test_categorical_shift_exact_below_k(spark):
    a = _snap(spark, 200, types=("a", "b"))
    b = _snap(spark, 200, types=("a", "c"))  # b's mass moves to c
    rep = drift_report(a, b, "k", "v", "c")
    # TV = 0.5*(|.5-.5| + |.5-0| + |0-.5|) = 0.5, exact (3 keys < k)
    assert abs(rep["tv_distance"] - 0.5) < 1e-9


def test_partition_independence(spark):
    a = _snap(spark, 500)
    b = _snap(spark, 500, key_off=100, val_scale=1.5)
    r1 = drift_report(a.repartition(1), b.repartition(1), "k", "v", "c")
    r8 = drift_report(a.repartition(8), b.repartition(8), "k", "v", "c")
    # theta (bottom-k) and MG (below-k regime) merge partition-
    # independently -> exact equality; KLL compaction depends on merge
    # order, so its KS estimate only agrees within the rank-error bound
    for key in ("distinct_a", "distinct_b", "key_jaccard", "tv_distance"):
        assert abs(r1[key] - r8[key]) < 1e-9, key
    assert abs(r1["ks_distance"] - r8["ks_distance"]) <= 0.05
