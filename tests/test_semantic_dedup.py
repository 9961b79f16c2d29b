"""SemDeDup semantic dedup (dedup/semantic.py) — unit invariants.

Driver gates check exact-mode value parity (DuckDB NOT-IN oracle) and
the clustered subset/recall contract at sf0.01; here we pin the kernel
semantics on constructed geometry: min-id survivor policy, witness
lineage, exact-mode ground truth, soft-assignment union semantics, and
partition independence.
"""

from __future__ import annotations

import numpy as np

from xorfilter_net_spark.dedup.semantic import (
    semantic_dedup,
    semdedup_survivors,
)


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, v array<double>",
    )


def _unit(*v):
    a = np.asarray(v, dtype=np.float64)
    return list(a / np.linalg.norm(a))


def test_exact_mode_min_id_policy(spark):
    # 1 ~ 2 ~ 3 (parallel); 10 orthogonal
    rows = [
        (1, _unit(1, 0, 0)),
        (2, _unit(1, 0.01, 0)),
        (3, _unit(1, -0.01, 0)),
        (10, _unit(0, 1, 0)),
    ]
    out = {
        r.vec_id: r
        for r in semantic_dedup(
            _emb(spark, rows), "vec_id", "v", 950000, n_cells=1
        ).collect()
    }
    assert not out[1].dropped and out[1].witness_id == -1
    assert out[2].dropped and out[2].witness_id == 1
    assert out[3].dropped and out[3].witness_id == 1
    assert not out[10].dropped
    surv = {
        r.vec_id
        for r in semdedup_survivors(
            _emb(spark, rows), "vec_id", "v", 950000, n_cells=1
        ).collect()
    }
    assert surv == {1, 10}


def test_greedy_by_id_is_not_transitive_closure(spark):
    """a~b and b~c but a!~c: both b and c drop (each has a smaller
    witness), survivor set is {a} — the documented greedy-by-id policy."""
    rows = [
        (1, _unit(1, 0)),
        (2, _unit(1, 0.35)),  # cos(1,2) ~ 0.944
        (3, _unit(1, 0.75)),  # cos(2,3) ~ 0.948, cos(1,3) = 0.8
    ]
    out = {
        r.vec_id: r
        for r in semantic_dedup(
            _emb(spark, rows), "vec_id", "v", 900000, n_cells=1
        ).collect()
    }
    assert not out[1].dropped
    assert out[2].dropped and out[2].witness_id == 1
    assert out[3].dropped and out[3].witness_id == 2


def test_clustered_drops_subset_of_exact(spark):
    rng = np.random.RandomState(3)
    rows = [(i, list(v / np.linalg.norm(v))) for i, v in
            ((i, rng.randn(16)) for i in range(40))]
    rows += [
        (100 + i, list(np.asarray(rows[i][1]) * 0.999 + 0.001))
        for i in range(0, 40, 5)
    ]
    df = _emb(spark, rows)
    exact = {
        r.vec_id
        for r in semantic_dedup(df, "vec_id", "v", 990000, n_cells=1)
        .filter("dropped")
        .collect()
    }
    for a in (1, 2):
        clustered = {
            r.vec_id
            for r in semantic_dedup(
                df, "vec_id", "v", 990000, n_cells=4, n_assign=a
            )
            .filter("dropped")
            .collect()
        }
        assert clustered <= exact
    assert exact  # the injected copies are true drops


def test_partition_independence(spark):
    rng = np.random.RandomState(7)
    rows = [(i, list(rng.randn(8))) for i in range(30)]
    rows += [(200 + i, rows[i][1]) for i in range(0, 30, 3)]
    df1 = _emb(spark, rows).repartition(1)
    df8 = _emb(spark, rows).repartition(8)
    r1 = sorted(
        (r.vec_id, r.dropped, r.witness_id)
        for r in semantic_dedup(df1, "vec_id", "v", 999000, n_cells=1).collect()
    )
    r8 = sorted(
        (r.vec_id, r.dropped, r.witness_id)
        for r in semantic_dedup(df8, "vec_id", "v", 999000, n_cells=1).collect()
    )
    assert r1 == r8


def test_soft_assignment_emits_one_verdict_per_id(spark):
    rng = np.random.RandomState(11)
    rows = [(i, list(rng.randn(8))) for i in range(50)]
    df = _emb(spark, rows)
    out = semantic_dedup(df, "vec_id", "v", 999999, n_cells=4, n_assign=3)
    assert out.count() == 50
    assert out.select("vec_id").distinct().count() == 50
