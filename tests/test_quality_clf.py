"""Distributed logistic-regression quality classifier (text/quality_clf.py):
NumPy-differential training parity, separability, determinism."""

from __future__ import annotations

import numpy as np

from xorfilter_net_spark.text.quality_clf import (
    featurize,
    score_logreg,
    train_logreg,
)

GOOD = [
    "the cat sat on the mat and it was a good day in the sun",
    "a dog ran to the park and the kids played in the grass",
    "it is a truth universally acknowledged that a reader wants text",
    "the ship sailed to the island and the crew found a quiet bay",
]
BAD = [
    "x9 7z qq3 8r1 zz 00 kk2 9v",
    "111 222 333 444 555 666 777",
    "q w e r t y u i o p 1 2 3",
    "zzzz 9999 xxxx 8888 yyyy 7777",
]


def _df(spark):
    rows = [(i, t, 1) for i, t in enumerate(GOOD)]
    rows += [(100 + i, t, 0) for i, t in enumerate(BAD)]
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def _numpy_reference(x, y, iters, lr, l2):
    mu, sd = x.mean(axis=0), x.std(axis=0)
    sd = np.where(sd > 0, sd, 1.0)
    xs = np.hstack([(x - mu) / sd, np.ones((len(x), 1))])
    w = np.zeros(xs.shape[1])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(xs @ w)))
        g = xs.T @ (p - y) / len(xs) + l2 * w
        w = w - lr * g
    return w


def test_training_matches_numpy_reference(spark):
    df = _df(spark)
    model = train_logreg(df, iters=25, lr=0.5, l2=1e-4)
    feats = {
        r.doc_id: np.array(r.features) for r in featurize(df).collect()
    }
    labels = {r.doc_id: r.label for r in df.collect()}
    ids = sorted(feats)
    x = np.stack([feats[i] for i in ids])
    y = np.array([labels[i] for i in ids], dtype=np.float64)
    want = _numpy_reference(x, y, iters=25, lr=0.5, l2=1e-4)
    assert np.allclose(model["w"], want, atol=1e-8)


def test_classifier_separates_fixture(spark):
    df = _df(spark)
    model = train_logreg(df, iters=60, lr=1.0)
    scored = {
        r.doc_id: r.quality_prob
        for r in score_logreg(df, model).collect()
    }
    for i in range(len(GOOD)):
        assert scored[i] > 0.5, (i, scored[i])
    for i in range(len(BAD)):
        assert scored[100 + i] < 0.5, (i, scored[100 + i])
    assert model["losses"][-1] < model["losses"][0]


def test_partition_independence_within_tolerance(spark):
    df = _df(spark)
    m1 = train_logreg(df.repartition(1), iters=15)
    m8 = train_logreg(df.repartition(8), iters=15)
    # gradients are float sums over partitions: order differs, values
    # agree to summation tolerance
    assert np.allclose(m1["w"], m8["w"], atol=1e-9)
