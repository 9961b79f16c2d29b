"""Sketch-family tests (north_rule): published error bounds + merge
associativity under arbitrary partitionings (FIXTURES.md F4)."""

import functools

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xorfilter_net_spark.sketches.bloom import BloomSketch
from xorfilter_net_spark.sketches.cms import CmsSketch
from xorfilter_net_spark.sketches.hll import HllSketch
from xorfilter_net_spark.sketches.kll import KllSketch
from xorfilter_net_spark.sketches.tdigest import TDigestSketch

RNG = np.random.default_rng(12345)
KEYS = pd.Series([f"key_{i}" for i in range(30_000)])
VALS = RNG.normal(100.0, 15.0, 120_000)


def random_splits(series, n_parts, seed):
    rng = np.random.default_rng(seed)
    assign = rng.integers(0, n_parts, len(series))
    return [series[assign == p].reset_index(drop=True) for p in range(n_parts)]


def fold(sketch, frames):
    sts = [
        sketch.update(sketch.zero(), pd.DataFrame({"x": f}))
        for f in frames
        if len(f)
    ]
    return functools.reduce(sketch.merge, sts)


# -- Bloom -------------------------------------------------------------------
def test_bloom_zero_fn_and_fpr():
    b = BloomSketch.for_capacity(30_000, fpp=0.01)
    st = fold(b, [KEYS])
    assert b.contains_series(st, KEYS).all()  # no false negatives, ever
    non = pd.Series([f"other_{i}" for i in range(30_000)])
    fpr = b.contains_series(st, non).mean()
    assert fpr < 0.02  # published bound (1-e^{-kn/m})^k ~= 0.01


def test_bloom_merge_associative_and_order_free():
    b = BloomSketch.for_capacity(30_000, fpp=0.01)
    parts = random_splits(KEYS, 7, seed=1)
    sts = [b.update(b.zero(), pd.DataFrame({"x": p})) for p in parts]
    left = functools.reduce(b.merge, sts)
    right = functools.reduce(b.merge, list(reversed(sts)))
    whole = b.update(b.zero(), pd.DataFrame({"x": KEYS}))
    assert np.array_equal(left.bits, right.bits)
    assert np.array_equal(left.bits, whole.bits)  # bit-identical to 1-partition


def test_bloom_serialize_roundtrip():
    b = BloomSketch.for_capacity(1000, fpp=0.01)
    st = b.update(b.zero(), pd.DataFrame({"x": KEYS[:1000]}))
    st2 = b.deserialize(b.serialize(st))
    assert np.array_equal(st.bits, st2.bits) and st2.n_added == st.n_added


# -- HLL ---------------------------------------------------------------------
@pytest.mark.parametrize("n_distinct", [100, 5_000, 30_000])
def test_hll_within_published_bound(n_distinct):
    h = HllSketch(p=14)
    keys = pd.Series([f"k{i % n_distinct}" for i in range(n_distinct * 2)])
    est = h.estimate(fold(h, [keys]))
    assert abs(est - n_distinct) / n_distinct < 4 * h.rel_std_error


def test_hll_merge_exactly_partition_independent():
    h = HllSketch(p=12)
    parts = random_splits(KEYS, 9, seed=2)
    merged = fold(h, parts)
    whole = fold(h, [KEYS])
    assert np.array_equal(merged, whole)  # max-merge is lossless


# -- CMS ---------------------------------------------------------------------
def test_cms_overestimate_only_and_bound():
    c = CmsSketch(d=5, w=2048)
    heavy = ["a"] * 5000 + ["b"] * 2000 + ["c"] * 700
    tail = [f"t{i}" for i in range(10_000)]
    data = pd.Series(heavy + tail)
    st = fold(c, [data])
    est = c.estimate_series(st, pd.Series(["a", "b", "c"]))
    true = np.array([5000, 2000, 700])
    assert (est >= true).all()  # never underestimates
    n = len(data)
    assert (est - true <= c.eps * n * 3).all()  # eps*N envelope


def test_cms_merge_exactly_partition_independent():
    c = CmsSketch(d=3, w=1024)
    parts = random_splits(KEYS, 5, seed=3)
    assert np.array_equal(fold(c, parts), fold(c, [KEYS]))


# -- KLL ---------------------------------------------------------------------
QS = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


def test_kll_rank_error_bound():
    k = KllSketch(k=200)
    st = fold(k, [pd.Series(VALS)])
    for q in QS:
        est = k.quantile(st, q)
        assert abs((VALS <= est).mean() - q) < 0.02


def test_kll_merge_within_bound_any_partitioning():
    k = KllSketch(k=200)
    for seed in (1, 2, 3):
        parts = random_splits(pd.Series(VALS), 8, seed=seed)
        st = fold(k, parts)
        for q in QS:
            est = k.quantile(st, q)
            assert abs((VALS <= est).mean() - q) < 0.025


def test_kll_deterministic_same_partitioning():
    k = KllSketch(k=128)
    parts = random_splits(pd.Series(VALS), 4, seed=9)
    a, b = fold(k, parts), fold(k, parts)
    assert all(np.array_equal(x, y) for x, y in zip(a.levels, b.levels))


# -- t-digest ----------------------------------------------------------------
def test_tdigest_rank_error_with_tail_accuracy():
    t = TDigestSketch(delta=200)
    st = fold(t, [pd.Series(VALS)])
    for q in (0.001, 0.01, 0.5, 0.99, 0.999):
        est = t.quantile(st, q)
        err = abs((VALS <= est).mean() - q)
        assert err < 0.02
        if q <= 0.01 or q >= 0.99:
            assert err < 0.005  # k1 scale: tails are tighter


def test_tdigest_extremes_exact():
    t = TDigestSketch(delta=100)
    st = fold(t, [pd.Series(VALS)])
    assert st.vmin == VALS.min() and t.quantile(st, 0.0) == VALS.min()
    assert st.vmax == VALS.max() and t.quantile(st, 1.0) == VALS.max()


def test_tdigest_merge_within_bound_any_partitioning():
    t = TDigestSketch(delta=200)
    for seed in (4, 5):
        parts = random_splits(pd.Series(VALS), 6, seed=seed)
        st = fold(t, parts)
        for q in QS:
            assert abs((VALS <= t.quantile(st, q)).mean() - q) < 0.025


def test_tdigest_centroid_count_bounded():
    t = TDigestSketch(delta=200)
    st = fold(t, [pd.Series(VALS)])
    assert st.means.size <= 200  # <= ~delta/2 + 2 for k1 bucketing


# -- Misra-Gries heavy hitters -------------------------------------------------
def test_mg_exact_when_distinct_below_k():
    from xorfilter_net_spark.sketches.misra_gries import MisraGriesSketch

    keys = pd.Series(np.repeat([f"t{i}" for i in range(5)], [500, 300, 150, 40, 10]))
    truth = keys.value_counts().to_dict()
    mg = MisraGriesSketch(k=8)
    for seed in (1, 2):
        for n_parts in (1, 7):
            est = mg.finish(fold(mg, random_splits(keys, n_parts, seed)))
            assert est == truth  # no shrink ever fires -> exact


def test_mg_bounds_under_any_partitioning():
    from xorfilter_net_spark.sketches.misra_gries import MisraGriesSketch

    rng = np.random.default_rng(7)
    # zipf-ish: many distinct, few heavy
    keys = pd.Series(np.minimum(rng.zipf(1.3, 60_000), 5000).astype(str))
    truth = keys.value_counts().to_dict()
    n = len(keys)
    mg = MisraGriesSketch(k=64)
    for n_parts, seed in ((1, 0), (4, 1), (16, 2)):
        st = fold(mg, random_splits(keys, n_parts, seed))
        est = mg.finish(st)
        assert len(est) <= 64
        for key, c in est.items():
            assert c <= truth[key]  # never overcounts
            assert truth[key] - c <= n / 65  # published undercount bound
        # every true heavy hitter above N/(k+1) is retained
        for key, t in truth.items():
            if t > n / 65:
                assert key in est
        # candidate set from heavy_hitters() keeps all phi-heavy items
        phi = 0.05
        hh = mg.heavy_hitters(st, phi)
        for key, t in truth.items():
            if t > phi * n:
                assert key in hh


def test_mg_serialize_roundtrip_and_merge_identity():
    from xorfilter_net_spark.sketches.misra_gries import MisraGriesSketch

    mg = MisraGriesSketch(k=4)
    st = mg.update(mg.zero(), pd.DataFrame({"x": list("aabbbccccddddde")}))
    rt = mg.deserialize(mg.serialize(st))
    assert mg.finish(rt) == mg.finish(st)
    merged = mg.merge(st, mg.zero())
    assert mg.finish(merged) == mg.finish(st)  # zero is the identity


# -- Theta/KMV ---------------------------------------------------------------
def test_theta_within_published_bound():
    from xorfilter_net_spark.sketches.theta import ThetaSketch

    sk = ThetaSketch(k=1024)
    st = fold(sk, [KEYS])
    est = sk.estimate(st)
    # 5 sigma of the published 1/sqrt(k-2) relative std error
    assert abs(est - 30_000) / 30_000 <= 5 * sk.rel_std_error


def test_theta_exact_mode_below_k():
    from xorfilter_net_spark.sketches.theta import ThetaSketch

    sk = ThetaSketch(k=4096)
    st = fold(sk, [KEYS.iloc[:2000]])
    assert sk.estimate(st) == 2000.0  # sketch IS the distinct set
    assert sk.theta(st) == 1.0


def test_theta_merge_exactly_partition_independent():
    from xorfilter_net_spark.sketches.theta import ThetaSketch

    sk = ThetaSketch(k=512)
    whole = fold(sk, [KEYS])
    for seed, n_parts in ((1, 3), (2, 8), (3, 17)):
        merged = fold(sk, random_splits(KEYS, n_parts, seed))
        # bottom-k of a union is grouping/order independent: states are
        # bit-identical, not merely close
        assert np.array_equal(merged, whole)


def test_theta_merge_idempotent_and_zero_identity():
    from xorfilter_net_spark.sketches.theta import ThetaSketch

    sk = ThetaSketch(k=256)
    st = fold(sk, [KEYS.iloc[:5000]])
    assert np.array_equal(sk.merge(st, st), st)
    assert np.array_equal(sk.merge(st, sk.zero()), st)
    rt = sk.deserialize(sk.serialize(st))
    assert np.array_equal(rt, st)


def test_theta_set_ops_exact_mode():
    from xorfilter_net_spark.sketches.theta import ThetaSketch

    sk = ThetaSketch(k=4096)
    a = fold(sk, [pd.Series([f"u{i}" for i in range(300)])])
    b = fold(sk, [pd.Series([f"u{i}" for i in range(200, 600)])])
    assert sk.intersection(a, b) == 100.0
    assert sk.a_not_b(a, b) == 200.0
    assert sk.a_not_b(b, a) == 300.0
    assert sk.union_estimate(a, b) == 600.0


def test_theta_set_ops_estimation_mode_bounds():
    from xorfilter_net_spark.sketches.theta import ThetaSketch

    sk = ThetaSketch(k=2048)
    a = fold(sk, [pd.Series([f"x{i}" for i in range(40_000)])])
    b = fold(sk, [pd.Series([f"x{i}" for i in range(20_000, 60_000)])])
    assert abs(sk.union_estimate(a, b) - 60_000) / 60_000 <= 5 * sk.rel_std_error
    # intersection variance scales with inverse overlap fraction (~1/3 here):
    # allow 5 sigma of rse / sqrt(overlap_fraction)
    tol = 5 * sk.rel_std_error / (1 / 3) ** 0.5
    assert abs(sk.intersection(a, b) - 20_000) / 20_000 <= tol
    assert abs(sk.a_not_b(a, b) - 20_000) / 20_000 <= tol


class TestSketchColumns:
    """sketches/columns.py: materialized sketch-state rollups."""

    @staticmethod
    def _events(spark):
        rows = [
            (f"t{u % 3}", f"d{d}", u)
            for u in range(120)
            for d in range(3)
            if (u + d) % 4  # uneven day coverage
        ]
        return spark.createDataFrame(rows, "typ string, day string, uid long")

    def test_rollup_state_equals_direct(self, spark):
        from xorfilter_net_spark.sketches.columns import (
            merge_states,
            partial_states,
        )

        df = self._events(spark)
        h = HllSketch(p=10, key_col="uid")
        daily = merge_states(
            partial_states(df, ["typ", "day"], ["uid"], h), ["typ", "day"], h
        )
        rolled = {
            r["typ"]: bytes(r["state"])
            for r in merge_states(daily, ["typ"], h).collect()
        }
        direct = {
            r["typ"]: bytes(r["state"])
            for r in merge_states(
                partial_states(df, ["typ"], ["uid"], h), ["typ"], h
            ).collect()
        }
        assert rolled == direct  # associativity end to end, byte-exact

    def test_partitioning_invariance(self, spark):
        from xorfilter_net_spark.sketches.columns import (
            merge_states,
            partial_states,
        )

        df = self._events(spark)
        h = HllSketch(p=10, key_col="uid")

        def states(d):
            return {
                r["typ"]: bytes(r["state"])
                for r in merge_states(
                    partial_states(d, ["typ"], ["uid"], h), ["typ"], h
                ).collect()
            }

        assert states(df.repartition(1)) == states(df.repartition(17, "uid"))

    def test_estimates_within_bound_and_parquet_roundtrip(self, spark, tmp_path):
        from xorfilter_net_spark.sketches.columns import (
            finish_estimates,
            merge_states,
            partial_states,
        )

        df = self._events(spark)
        h = HllSketch(p=12, key_col="uid")
        daily = merge_states(
            partial_states(df, ["typ", "day"], ["uid"], h), ["typ", "day"], h
        )
        # the production pattern: states persisted as a binary column, the
        # rollup reads ONLY the state table
        path = str(tmp_path / "daily_states")
        daily.write.parquet(path)
        stored = spark.read.parquet(path)
        est = {
            r["typ"]: r["estimate"]
            for r in finish_estimates(
                merge_states(stored, ["typ"], h), ["typ"], h
            ).collect()
        }
        exact = {
            r["typ"]: r["n"]
            for r in df.groupBy("typ")
            .agg(F.count_distinct("uid").alias("n"))
            .collect()
        }
        assert set(est) == set(exact)
        for t, ex in exact.items():
            assert abs(est[t] - ex) / ex <= 4 * h.rel_std_error

    def test_works_for_theta_and_null_group_keys(self, spark):
        from xorfilter_net_spark.sketches.columns import (
            merge_states,
            partial_states,
        )
        from xorfilter_net_spark.sketches.theta import ThetaSketch

        df = spark.createDataFrame(
            [(None, "a"), (None, "b"), ("g", "a"), ("g", "a")],
            "typ string, v string",
        )
        sk = ThetaSketch(k=256)
        out = {
            r["typ"]: sk.estimate(sk.deserialize(bytes(r["state"])))
            for r in merge_states(
                partial_states(df, ["typ"], ["v"], sk), ["typ"], sk
            ).collect()
        }
        assert out == {None: 2.0, "g": 1.0}


# -- Bottom-k uniform sample --------------------------------------------------
def _bk_frames(k=None):
    """Hashed (h, key, payload) frames mimicking with_sample_hash output."""
    import hashlib

    keys = pd.Series([f"u{i % 500}" for i in range(6_000)])
    payload = pd.Series(np.arange(6_000)[::-1] % 977)
    h = keys.map(lambda s: hashlib.md5(s.encode()).hexdigest())
    return pd.DataFrame({"__bk_hash": h, "k": keys, "v": payload})


def test_bottomk_partition_invariant_and_fixed_size():
    from xorfilter_net_spark.sketches.bottomk import BottomKSample

    sk = BottomKSample(64, "k")
    pdf = _bk_frames()
    whole = sk.update(sk.zero(), pdf)
    assert len(whole) == 64
    assert whole["k"].is_unique
    assert list(whole["__bk_hash"]) == sorted(whole["__bk_hash"])
    for seed in (1, 2, 3):
        rng = np.random.default_rng(seed)
        assign = rng.integers(0, 9, len(pdf))
        sts = [
            sk.update(sk.zero(), pdf[assign == p].reset_index(drop=True))
            for p in range(9)
            if (assign == p).any()
        ]
        merged = functools.reduce(sk.merge, sts)
        # identical sample rows (incl. the deterministic payload pick)
        pd.testing.assert_frame_equal(
            merged.reset_index(drop=True), whole.reset_index(drop=True)
        )
        rev = functools.reduce(sk.merge, list(reversed(sts)))
        pd.testing.assert_frame_equal(
            rev.reset_index(drop=True), whole.reset_index(drop=True)
        )


def test_bottomk_zero_identity_and_serialize_roundtrip():
    from xorfilter_net_spark.sketches.bottomk import BottomKSample

    sk = BottomKSample(16, "k")
    pdf = _bk_frames()
    st = sk.update(sk.zero(), pdf)
    assert sk.merge(st, sk.zero()) is st
    assert sk.merge(sk.zero(), st) is st
    rt = sk.deserialize(sk.serialize(st))
    pd.testing.assert_frame_equal(rt, st)
    fin = sk.finish(sk.zero())
    assert len(fin) == 0 and "k" in fin.columns


def test_bottomk_spark_end_to_end_matches_sql(spark, sf_small):
    """Two-phase Spark aggregation == the engine-portable SQL definition
    (order by md5(key), key limit k) — the driver-contract invariant."""
    from xorfilter_net_spark.sketches.bottomk import bottomk_sample

    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    got = bottomk_sample(ev.repartition(13), "user_id", k=37)
    exp = (
        ev.select("user_id")
        .distinct()
        .select(F.md5(F.col("user_id").cast("string")).alias("h"), "user_id")
        .orderBy("h", "user_id")
        .limit(37)
        .toPandas()
    )
    assert list(got["user_id"]) == list(exp["user_id"])
    assert list(got["__bk_hash"]) == list(exp["h"])


class TestWeightedBottomK:
    """Weighted bottom-k (ticket-min Efraimidis-Spirakis, exact arith)."""

    def test_spark_matches_duckdb_definition(self, spark, sf_small):
        import duckdb

        from xorfilter_net_spark.sketches.bottomk import (
            bottomk_weighted,
            weighted_oracle_sql,
        )

        docs = spark.read.parquet(f"{sf_small}/documents.parquet")
        got = bottomk_weighted(
            docs.repartition(11), "doc_id", "n_chars", k=50
        )
        con = duckdb.connect()
        con.execute(
            "create view documents as select * from "
            f"read_parquet('{sf_small}/documents.parquet')"
        )
        want = con.execute(
            weighted_oracle_sql("documents", "doc_id", "n_chars", k=50)
        ).df()
        assert list(got["doc_id"]) == list(want["key"])
        assert list(got["__bk_hash"]) == list(want["h"])

    def test_weight_monotone_inclusion(self, spark):
        """Keys with weight 32 must be strongly overrepresented vs
        weight 1 (expected ~32:1 odds per slot; assert a loose 2:1)."""
        from xorfilter_net_spark.sketches.bottomk import bottomk_weighted

        df = spark.range(2000).selectExpr(
            "id", "case when id % 2 = 0 then 32 else 1 end as w"
        )
        pdf = bottomk_weighted(df, "id", "w", k=200)
        heavy = int((pdf["id"] % 2 == 0).sum())
        assert len(pdf) == 200
        assert heavy > 2 * (200 - heavy), heavy

    def test_weight_clamp_and_null_weight(self, spark):
        """Weights <=0 / null behave as 1; w_max caps the tickets (so a
        weight of 10^9 costs w_max md5 evals, not 10^9)."""
        from xorfilter_net_spark.sketches.bottomk import (
            bottomk_weighted,
            with_weighted_hash,
        )

        df = spark.createDataFrame(
            [(1, None), (2, -5), (3, 1)], "id long, w int"
        )
        hashed = with_weighted_hash(df, "id", "w", w_max=64).collect()
        by_id = {r["id"]: r["__bk_hash"] for r in hashed}
        import hashlib

        for i in (1, 2, 3):
            assert by_id[i] == hashlib.md5(f"{i}:0".encode()).hexdigest()
        big = spark.createDataFrame([(7, 10**9)], "id long, w long")
        pdf = bottomk_weighted(big, "id", "w", k=1, w_max=8)
        expect = min(
            hashlib.md5(f"7:{j}".encode()).hexdigest() for j in range(8)
        )
        assert pdf["__bk_hash"][0] == expect


# -- Count sketch / AMS F2 -----------------------------------------------------
def test_countsketch_frequency_within_l2_bound():
    from xorfilter_net_spark.sketches.countsketch import CountSketch

    cs = CountSketch(d=7, w=2048)
    heavy = ["a"] * 5000 + ["b"] * 2000 + ["c"] * 700
    tail = [f"t{i}" for i in range(10_000)]
    data = pd.Series(heavy + tail)
    st = fold(cs, [data])
    est = cs.estimate_series(st, pd.Series(["a", "b", "c", "t0", "absent"]))
    true = np.array([5000, 2000, 700, 1, 0])
    l2 = np.sqrt(5000.0**2 + 2000**2 + 700**2 + 10_000)
    # published: |est - f| <= eps * ||f||_2 w.p. 1-delta, eps = sqrt(3/w)
    assert (np.abs(est - true) <= cs.eps * l2).all()


def test_countsketch_f2_within_variance_envelope():
    from xorfilter_net_spark.sketches.countsketch import CountSketch

    cs = CountSketch(d=9, w=4096)
    counts = RNG.integers(1, 50, 4000)
    data = pd.Series(np.repeat([f"k{i}" for i in range(4000)], counts))
    st = fold(cs, [data])
    f2_true = float((counts.astype(np.float64) ** 2).sum())
    # per-row rel sd = sqrt(2/w); median of 9 rows well inside 4 sd
    assert abs(cs.f2(st) - f2_true) / f2_true < 4 * cs.f2_rel_sd


def test_countsketch_merge_exactly_partition_independent():
    from xorfilter_net_spark.sketches.countsketch import CountSketch

    cs = CountSketch(d=5, w=1024)
    parts = random_splits(KEYS, 6, seed=4)
    sts = [cs.update(cs.zero(), pd.DataFrame({"x": p})) for p in parts]
    left = functools.reduce(cs.merge, sts)
    right = functools.reduce(cs.merge, list(reversed(sts)))
    whole = fold(cs, [KEYS])
    assert np.array_equal(left, whole) and np.array_equal(right, whole)


def test_countsketch_serialize_roundtrip_and_exact_when_collision_free():
    from xorfilter_net_spark.sketches.countsketch import CountSketch

    cs = CountSketch(d=7, w=8192)
    data = pd.Series(["x"] * 10 + ["y"] * 3 + ["z"] * 1)
    st = cs.deserialize(cs.serialize(fold(cs, [data])))
    est = cs.estimate_series(st, pd.Series(["x", "y", "z"]))
    # 3 keys in 8192 buckets: median over 7 rows is collision-free => exact
    assert np.array_equal(est, np.array([10.0, 3.0, 1.0]))


# -- Frequent Directions -------------------------------------------------------
def _fd_data(n=3000, d=32, seed=7):
    rng = np.random.default_rng(seed)
    # low-rank-plus-noise: the realistic embedding-corpus spectrum
    basis = rng.normal(size=(4, d))
    A = rng.normal(size=(n, 4)) @ basis * 3.0 + rng.normal(size=(n, d)) * 0.3
    return A


def _fd_fold(fd, mats):
    sts = [
        fd.update(fd.zero(), pd.DataFrame({"v": list(m)})) for m in mats if len(m)
    ]
    return functools.reduce(fd.merge, sts)


def test_fd_spectral_bound_and_underestimate_only():
    from xorfilter_net_spark.sketches.fd import FrequentDirections

    A = _fd_data()
    fd = FrequentDirections(ell=16, d=32)
    st = _fd_fold(fd, [A])
    diff = A.T @ A - fd.gram(st)
    eigs = np.linalg.eigvalsh(diff)
    fro2 = float((A**2).sum())
    assert eigs.max() <= 2.0 * fro2 / fd.ell + 1e-6  # published bound
    assert eigs.max() <= fd.cov_error_bound(st) + 1e-6
    assert eigs.min() >= -1e-6 * fro2  # A'A - B'B is PSD: never overestimates


def test_fd_bound_survives_arbitrary_merge_trees():
    from xorfilter_net_spark.sketches.fd import FrequentDirections

    A = _fd_data()
    fd = FrequentDirections(ell=16, d=32)
    for seed in (1, 2, 3):
        rng = np.random.default_rng(seed)
        assign = rng.integers(0, 7, len(A))
        st = _fd_fold(fd, [A[assign == p] for p in range(7)])
        diff = A.T @ A - fd.gram(st)
        eigs = np.linalg.eigvalsh(diff)
        assert eigs.max() <= fd.cov_error_bound(st) + 1e-6
        assert eigs.min() >= -1e-6 * (A**2).sum()


def test_fd_exact_below_buffer_and_serialize_roundtrip():
    from xorfilter_net_spark.sketches.fd import FrequentDirections

    A = _fd_data(n=20, d=32)
    fd = FrequentDirections(ell=16, d=32)  # buffer 32 > 20 rows: no shrink
    st = _fd_fold(fd, [A[:9], A[9:]])
    assert np.allclose(fd.gram(st), A.T @ A)
    st2 = fd.deserialize(fd.serialize(st))
    assert np.allclose(fd.gram(st2), fd.gram(st)) and st2[1] == st[1]


def test_fd_top_direction_recovered():
    from xorfilter_net_spark.sketches.fd import FrequentDirections

    A = _fd_data()
    fd = FrequentDirections(ell=16, d=32)
    st = _fd_fold(fd, [A])
    # the dominant eigenvector of B'B aligns with the exact one
    _, v_exact = np.linalg.eigh(A.T @ A)
    _, v_sk = np.linalg.eigh(fd.gram(st))
    assert abs(v_exact[:, -1] @ v_sk[:, -1]) > 0.99


# -- Counting Bloom -----------------------------------------------------------
def test_cbf_delete_semantics_and_merge():
    from xorfilter_net_spark.sketches.cbf import CountingBloomSketch

    cb = CountingBloomSketch.for_capacity(30_000, fpp=0.01)
    ins = fold(cb, [KEYS])
    dele = fold(cb, [KEYS[::3].reset_index(drop=True)])
    live = cb.subtract(ins, dele)
    keeps = KEYS[KEYS.index % 3 != 0].reset_index(drop=True)
    # (a) no false negatives on surviving keys
    assert cb.contains(live, keeps).all()
    # (b) deleted keys genuinely removed: hit rate ~ FPR, not 1.0
    deleted = KEYS[::3].reset_index(drop=True)
    assert cb.contains(live, deleted).mean() < 0.05
    # (c) merge is partition-order independent (counter addition)
    parts = random_splits(KEYS, 5, seed=7)
    sts = [cb.update(cb.zero(), pd.DataFrame({"x": p})) for p in parts]
    left = functools.reduce(cb.merge, sts)
    right = functools.reduce(cb.merge, list(reversed(sts)))
    assert np.array_equal(left.counts, right.counts)
    assert np.array_equal(left.counts, ins.counts)


def test_cbf_subtract_rejects_non_subset_and_roundtrips():
    from xorfilter_net_spark.sketches.cbf import CountingBloomSketch

    cb = CountingBloomSketch.for_capacity(1000, fpp=0.01)
    ins = cb.update(cb.zero(), pd.DataFrame({"x": KEYS[:500]}))
    rogue = cb.update(cb.zero(), pd.DataFrame({"x": pd.Series(["never_inserted"])}))
    with pytest.raises(ValueError):
        cb.subtract(ins, rogue)
    st2 = cb.deserialize(cb.serialize(ins))
    assert np.array_equal(ins.counts, st2.counts) and st2.n_added == ins.n_added


def test_countsketch_join_size_within_variance_envelope():
    from xorfilter_net_spark.sketches.countsketch import CountSketch

    # two relations with known overlap: f_A(k)=a_k, f_B(k)=b_k on shared keys
    rng = np.random.default_rng(99)
    keys = [f"k_{i}" for i in range(2000)]
    a_rows = pd.Series(np.repeat(keys, rng.integers(1, 6, 2000)))
    b_rows = pd.Series(np.repeat(keys[:1200], rng.integers(1, 6, 1200)))
    fa = a_rows.value_counts()
    fb = b_rows.value_counts()
    exact = int((fa * fb).dropna().sum())

    cs = CountSketch(d=7, w=8192)
    sa = cs.update(cs.zero(), pd.DataFrame({"x": a_rows}))
    sb = cs.update(cs.zero(), pd.DataFrame({"x": b_rows}))
    est = cs.inner_product(sa, sb)
    # variance <= 2 F2(A) F2(B) / w per row; gate at 6 per-row sigmas
    f2a = float((fa**2).sum())
    f2b = float((fb**2).sum())
    sd = (2 * f2a * f2b / cs.w) ** 0.5
    assert abs(est - exact) < 6 * sd
    # merge-invariance: partition either side arbitrarily, same estimate
    parts = random_splits(a_rows, 5, seed=3)
    sa2 = functools.reduce(
        cs.merge, [cs.update(cs.zero(), pd.DataFrame({"x": p})) for p in parts]
    )
    assert np.array_equal(sa, sa2)
    # geometry guard
    with pytest.raises(ValueError):
        cs.inner_product(sa, np.zeros((2, 2)))


def test_hll_sparse_wire_format_roundtrip_and_size():
    h = HllSketch(p=12)
    # small group -> sparse encoding, much smaller than the dense array
    small = h.update(h.zero(), pd.DataFrame({"x": KEYS[:50]}))
    blob_small = h.serialize(small)
    assert len(blob_small) < h.m // 4
    rt = h.deserialize(blob_small)
    assert np.array_equal(rt, small)
    assert h.estimate(rt) == h.estimate(small)
    # big group -> dense encoding, still roundtrips
    big = h.update(h.zero(), pd.DataFrame({"x": KEYS}))
    rt2 = h.deserialize(h.serialize(big))
    assert np.array_equal(rt2, big)
    # encoding is a pure function of the registers: equal states ->
    # byte-identical blobs (the rollup byte-identity gate relies on this)
    small_b = h.update(h.zero(), pd.DataFrame({"x": KEYS[:50].iloc[::-1]}))
    assert h.serialize(small_b) == blob_small


# -- DDSketch ------------------------------------------------------------------
def test_ddsketch_relative_error_bound():
    from xorfilter_net_spark.sketches.ddsketch import DDSketch

    d = DDSketch(alpha=0.01)
    st = fold(d, [pd.Series(VALS)])
    srt = np.sort(VALS)
    for q in QS:
        exact = srt[int(np.floor(q * (len(srt) - 1)))]
        est = d.quantile(st, q)
        # published guarantee: |est - x_q| <= alpha * x_q (+ log-ulp slack)
        assert abs(est - exact) <= d.alpha * abs(exact) * 1.0001


def test_ddsketch_merge_bit_identical_any_partitioning():
    from xorfilter_net_spark.sketches.ddsketch import DDSketch

    d = DDSketch(alpha=0.01)
    whole = fold(d, [pd.Series(VALS)])
    for seed in (1, 2, 3):
        parts = random_splits(pd.Series(VALS), 8, seed=seed)
        st = fold(d, parts)
        # merge is plain counter addition: the merged state is EXACTLY the
        # single-pass state under any partitioning (strongest in the family)
        assert st.pos == whole.pos and st.neg == whole.neg
        assert st.zeros == whole.zeros and st.n == whole.n
        assert d.serialize(st) == d.serialize(whole)


def test_ddsketch_zero_negative_and_serialize_roundtrip():
    from xorfilter_net_spark.sketches.ddsketch import DDSketch

    d = DDSketch(alpha=0.02)
    vals = np.concatenate([-np.abs(VALS[:40_000]), np.zeros(5_000), np.abs(VALS[40_000:80_000])])
    st = fold(d, [pd.Series(vals)])
    rt = d.deserialize(d.serialize(st))
    assert rt.pos == st.pos and rt.neg == st.neg and rt.zeros == st.zeros
    srt = np.sort(vals)
    for q in (0.05, 0.25, 0.47, 0.5, 0.75, 0.95):
        exact = srt[int(np.floor(q * (len(srt) - 1)))]
        est = d.quantile(st, q)
        if exact == 0.0:
            assert est == 0.0
        else:
            assert abs(est - exact) <= d.alpha * abs(exact) * 1.0001


def test_ddsketch_collapse_caps_bins_and_keeps_upper_quantiles():
    from xorfilter_net_spark.sketches.ddsketch import DDSketch

    rng = np.random.default_rng(7)
    vals = np.exp(rng.uniform(-20, 20, 50_000))  # huge dynamic range
    d = DDSketch(alpha=0.02, max_bins=256)
    st = fold(d, random_splits(pd.Series(vals), 6, seed=4))
    assert len(st.pos) + len(st.neg) <= 256
    srt = np.sort(vals)
    for q in (0.9, 0.95, 0.99):  # above the collapsed mass
        exact = srt[int(np.floor(q * (len(srt) - 1)))]
        assert abs(d.quantile(st, q) - exact) <= d.alpha * exact * 1.0001


def test_ddsketch_rollup_query_gates(spark, sf_tiny):
    """Sketch-column rollup for quantiles: byte-identical rolled-up
    states + rank gates hold at the tiny SF too."""
    from xorfilter_net_spark import entrypoints

    out = entrypoints.QUERIES["ddsketch_rollup_events_ok"](
        spark, sf_tiny
    ).collect()
    assert out
    for r in out:
        assert r["rollup_matches_direct"]
        assert r["p50_rank_ok"] and r["p95_rank_ok"]
