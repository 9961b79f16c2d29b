"""relational/stats.py: Gini exactness vs hand-computed values and a
pure-Python replay; tie invariance; degenerate domains."""

from __future__ import annotations

from fractions import Fraction

import pytest

from xorfilter_net_spark.relational.stats import gini_by_group


def _py_gini(values):
    q = sorted(int(v) for v in values)
    n = len(q)
    s = sum(q)
    iq = sum(i * x for i, x in enumerate(q, start=1))
    if n * s == 0:
        return None
    return Fraction(2 * iq - (n + 1) * s, n * s)


def test_known_distributions(spark):
    rows = (
        # perfectly equal -> gini 0
        [("eq", 10.0)] * 5
        # one owner takes all -> gini (n-1)/n = 4/5
        + [("uneq", 0.0)] * 4
        + [("uneq", 100.0)]
        # all-zero mass -> undefined
        + [("zero", 0.0)] * 3
    )
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in gini_by_group(df, "g", "v").collect()}
    assert out["eq"]["gini_num"] == 0
    assert (
        Fraction(out["uneq"]["gini_num"], out["uneq"]["gini_den"])
        == Fraction(4, 5)
    )
    assert out["zero"]["gini_num"] is None
    assert out["zero"]["gini_den"] is None


def test_python_replay_and_tie_invariance(spark):
    import random

    rng = random.Random(7)
    rows = [
        (f"g{rng.randrange(3)}", float(rng.choice([0, 1, 1, 5, 5, 5, 40])))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    by_g: dict = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for reparts in (1, 7):
        out = {
            r["g"]: (r["gini_num"], r["gini_den"])
            for r in gini_by_group(
                df.repartition(reparts), "g", "v"
            ).collect()
        }
        for g, vals in by_g.items():
            want = _py_gini(vals)
            assert Fraction(*out[g]) == want


def test_negative_values_raise(spark):
    df = spark.createDataFrame([("g", -1.0)], "g string, v double")
    with pytest.raises(Exception, match="non-negative"):
        gini_by_group(df, "g", "v").collect()
