"""Unit tests for relational/: as-of join, sessionization, salted join.

Driver-contract-level equivalence (DuckDB ASOF JOIN / window-program
oracles at sf0.01) is covered by tools/check_contract.py; these pin the
operator semantics on adversarial micro-inputs — ties, no-match rows,
exact-gap boundaries — where oracle data may never land.
"""

from __future__ import annotations

import datetime as dt

import pytest

from xorfilter_net_spark.relational import asof_join, salted_join, sessionize


def _ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def left(spark):
    return spark.createDataFrame(
        [
            ("u1", _ts(10), "L-early"),  # before any right row -> null match
            ("u1", _ts(20), "L-tie"),  # exactly simultaneous right row matches
            ("u1", _ts(45), "L-late"),  # latest prior wins, not first
            ("u2", _ts(30), "L-other-key"),  # keys do not cross
        ],
        "k string, ts timestamp, tag string",
    )


@pytest.fixture(scope="module")
def right(spark):
    return spark.createDataFrame(
        [
            ("u1", _ts(20), 200),
            ("u1", _ts(40), 400),
            ("u1", _ts(50), 500),  # in the future of every left row
            ("u3", _ts(0), 999),  # key absent on the left
        ],
        "k string, ts timestamp, v int",
    )


def test_asof_latest_prior_or_equal(left, right):
    rows = {
        r["tag"]: (r["ts_asof"], r["v_asof"])
        for r in asof_join(left, right, on="k", ts="ts").collect()
    }
    assert rows["L-early"] == (None, None)
    assert rows["L-tie"] == (_ts(20), 200)  # <= includes the tie
    assert rows["L-late"] == (_ts(40), 400)  # latest prior, not _ts(20)
    assert rows["L-other-key"] == (None, None)
    assert len(rows) == 4  # every left row survives exactly once


def test_asof_single_shuffle_plan(left, right):
    plan = (
        asof_join(left, right, on="k", ts="ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one window over the union, no join operator at all
    assert plan.lower().count("exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_sessionize_gap_boundaries(spark):
    gap_s = 30 * 60
    base = dt.datetime(2024, 1, 1)
    rows = [
        # u1: gaps of (gap-1s, exactly gap, gap+1s) -> the exactly-gap
        # successor still merges (session_window is end-closed); only
        # the strictly-greater gap breaks the session
        ("u1", base),
        ("u1", base + dt.timedelta(seconds=gap_s - 1)),
        ("u1", base + dt.timedelta(seconds=2 * gap_s - 1)),
        ("u1", base + dt.timedelta(seconds=3 * gap_s)),
        # u2: single event -> its own session
        ("u2", base),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = {
        (r["k"], r["session_start"]): r["n_events"]
        for r in sessionize(df, key="k", ts="ts", gap="30 minutes").collect()
    }
    assert got == {
        ("u1", base): 3,
        ("u1", base + dt.timedelta(seconds=3 * gap_s)): 1,
        ("u2", base): 1,
    }


def test_salted_join_matches_plain_join(spark):
    big = spark.createDataFrame(
        [(i, i % 3) for i in range(300)], "row_id long, k long"
    )
    small = spark.createDataFrame([(0, "a"), (1, "b")], "k long, attr string")
    got = sorted(
        (r["row_id"], r["attr"])
        for r in salted_join(big, small, on="k", salt_src="row_id").collect()
    )
    want = sorted(
        (r["row_id"], r["attr"]) for r in big.join(small, "k").collect()
    )
    assert got == want  # inner join drops k=2, keeps 200 rows
    assert len(got) == 200


def test_salted_join_spreads_hot_key(spark):
    from pyspark.sql import functions as F

    big = spark.createDataFrame(
        [(i, 7) for i in range(1000)], "row_id long, k long"
    )
    small = spark.createDataFrame([(7, "hot")], "k long, attr string")
    n_salts = 8
    salt = F.pmod(F.xxhash64("row_id"), F.lit(n_salts)).cast("int")
    n_buckets = (
        big.withColumn("s", salt).select("s").distinct().count()
    )
    assert n_buckets == n_salts  # the hot key really fans out
    assert salted_join(big, small, on="k", salt_src="row_id", num_salts=n_salts).count() == 1000


def test_interval_join_matches_naive(spark):
    from pyspark.sql import functions as F

    # intervals: half-open, one spans many buckets, one ends exactly on
    # a bucket boundary, one never matches
    intervals = spark.createDataFrame(
        [
            ("i1", "u1", _ts(10), _ts(20)),
            ("i2", "u1", _ts(15), dt.datetime(2024, 1, 1, 5, 0)),  # 5h span
            ("i3", "u2", _ts(0), dt.datetime(2024, 1, 1, 1, 0)),  # ends on boundary
            ("i4", "u9", _ts(0), _ts(59)),
        ],
        "iid string, user_id string, start_ts timestamp, end_ts timestamp",
    )
    points = spark.createDataFrame(
        [
            ("p-at-start", "u1", _ts(10)),  # ts == start included
            ("p-at-end", "u1", _ts(20)),  # ts == end excluded (i1), in i2
            ("p-mid", "u1", dt.datetime(2024, 1, 1, 3, 30)),  # deep in i2
            ("p-boundary", "u2", dt.datetime(2024, 1, 1, 1, 0)),  # == i3 end
            ("p-other", "u2", _ts(30)),
        ],
        "pid string, user_id string, ts timestamp",
    )
    from xorfilter_net_spark.relational import interval_join

    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(
            points, intervals, "ts", "start_ts", "end_ts",
            bucket_s=3600, extra_key="user_id",
        ).collect()
    )
    naive = sorted(
        (r["pid"], r["iid"])
        for r in points.alias("p")
        .join(
            intervals.alias("i"),
            (F.col("p.user_id") == F.col("i.user_id"))
            & (F.col("p.ts") >= F.col("i.start_ts"))
            & (F.col("p.ts") < F.col("i.end_ts")),
        )
        .collect()
    )
    assert got == naive
    assert got == [
        ("p-at-end", "i2"),
        ("p-at-start", "i1"),
        ("p-mid", "i2"),
        ("p-other", "i3"),
    ]


def test_hash_split_deterministic_and_consistent(spark):
    from xorfilter_net_spark.relational import sample_hash, split_hash

    docs = spark.createDataFrame(
        [(i, f"document number {i}") for i in range(2000)],
        "doc_id long, text string",
    )
    s1 = {r["doc_id"]: r["split"] for r in split_hash(docs, ["text"], 0.1).collect()}
    # repartitioning must not move any row between splits (df.sample would)
    s2 = {
        r["doc_id"]: r["split"]
        for r in split_hash(docs.repartition(13), ["text"], 0.1).collect()
    }
    assert s1 == s2
    frac = sum(1 for v in s1.values() if v == "val") / len(s1)
    assert 0.06 < frac < 0.14  # ~binomial(2000, 0.1)
    # growing the corpus keeps existing assignments (content-keyed)
    grown = docs.unionAll(
        spark.createDataFrame(
            [(i, f"document number {i}") for i in range(2000, 3000)],
            "doc_id long, text string",
        )
    )
    s3 = {r["doc_id"]: r["split"] for r in split_hash(grown, ["text"], 0.1).collect()}
    assert all(s3[k] == v for k, v in s1.items())
    # edge fractions
    assert sample_hash(docs, ["text"], 1.0).count() == 2000
    assert sample_hash(docs, ["text"], 0.0).count() == 0


def test_sample_sql_matches_spark_predicate(spark):
    """The engine-portable SQL predicate selects the exact same rows in
    DuckDB as sample_hash does in Spark."""
    import duckdb

    from xorfilter_net_spark.relational import sample_hash, sample_sql

    texts = [(f"doc {i} body",) for i in range(500)]
    spark_ids = {
        r["text"]
        for r in sample_hash(
            spark.createDataFrame(texts, "text string"), ["text"], 0.25
        ).collect()
    }
    con = duckdb.connect()
    con.execute("create table t(text varchar)")
    con.executemany("insert into t values (?)", texts)
    duck_ids = {
        r[0]
        for r in con.execute(
            f"select text from t where {sample_sql('text', 0.25)}"
        ).fetchall()
    }
    assert spark_ids == duck_ids


# -- chunking ----------------------------------------------------------------
def test_chunk_documents_reconstructs_text(spark):
    from xorfilter_net_spark.text.chunking import chunk_documents

    rows = [
        (1, "a" * 48),          # shorter than one window -> 1 chunk
        (2, "x" * 256),          # exactly one window
        (3, "".join(chr(97 + i % 26) for i in range(1000))),
        (4, None),               # null -> one empty chunk, row survives
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, "text", max_chars=256, overlap=64)
    got = {r["doc_id"]: [] for r in out.collect()}
    for r in out.orderBy("doc_id", "chunk_idx").collect():
        got[r["doc_id"]].append((r["chunk_idx"], r["chunk"]))
    stride = 256 - 64
    for doc_id, text in rows:
        text = text or ""
        chunks = got[doc_id]
        assert [i for i, _ in chunks] == list(range(len(chunks)))
        # stitching chunks at stride offsets reconstructs the document
        rebuilt = ""
        for i, c in chunks:
            rebuilt = rebuilt[: i * stride] + c
        assert rebuilt == text
        # consecutive chunks share exactly `overlap` characters
        for (i, a), (_, b) in zip(chunks, chunks[1:]):
            assert a[stride:] == b[: len(a) - stride]
        # last chunk reaches the end; no chunk count waste
        expected_n = max(1, -(-(len(text) - 64) // stride))
        assert len(chunks) == expected_n


def test_chunk_documents_is_map_only(spark):
    from xorfilter_net_spark.text.chunking import chunk_documents

    df = spark.createDataFrame([(1, "z" * 500)], "doc_id long, text string")
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle
    assert "Python" not in plan  # no UDF: generator + codegen exprs only


# -- stratified sampling -----------------------------------------------------
def test_stratified_sample_quota_and_determinism(spark):
    from xorfilter_net_spark.relational import stratified_sample_hash

    rows = [(i, f"g{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = stratified_sample_hash(df, ["grp"], ["doc_id"], k=10)
    pdf = out.toPandas()
    assert (pdf.groupby("grp").size() == 10).all()
    # partitioning-independent: identical selection from a repartitioned input
    out2 = stratified_sample_hash(df.repartition(17), ["grp"], ["doc_id"], k=10)
    assert set(map(tuple, pdf.values.tolist())) == set(
        map(tuple, out2.toPandas().values.tolist())
    )


def test_stratified_sample_stable_under_growth(spark):
    from xorfilter_net_spark.relational import stratified_sample_hash

    small = spark.createDataFrame(
        [(i, "g") for i in range(100)], "doc_id long, grp string"
    )
    grown = spark.createDataFrame(
        [(i, "g") for i in range(200)], "doc_id long, grp string"
    )
    pick = lambda df: {
        r["doc_id"] for r in stratified_sample_hash(df, ["grp"], ["doc_id"], 10).collect()
    }
    s, g = pick(small), pick(grown)
    # reservoir-like displacement: a row leaves the sample only when a
    # lower-hashed row arrives in its group. Any grown-sample member from
    # the original 100 rows had grown-rank <= 10, hence small-rank <= 10:
    # it MUST be in the small sample (prefix-stable order, no churn)
    assert {d for d in g if d < 100} <= s
    assert s & g  # and survivors actually exist


# -- xor-filter join pruning --------------------------------------------------
def test_filter_pruned_join_row_identical(spark, sf_tiny):
    from pyspark.sql import functions as F

    from xorfilter_net_spark.relational import filter_pruned_join

    o = spark.read.parquet(f"{sf_tiny}/orders.parquet")
    c = spark.read.parquet(f"{sf_tiny}/customer.parquet").filter(
        F.col("c_acctbal") > 5000
    )
    for width in (8, 16):
        pj = filter_pruned_join(o, c, "o_custkey", "c_custkey", width=width)
        plain = o.join(c, o.o_custkey == c.c_custkey)
        got = sorted(
            (r["o_orderkey"], r["c_custkey"]) for r in pj.select("o_orderkey", "c_custkey").collect()
        )
        want = sorted(
            (r["o_orderkey"], r["c_custkey"]) for r in plain.select("o_orderkey", "c_custkey").collect()
        )
        assert got == want  # FPs die in the join; zero FNs -> identical


def test_filter_pruned_join_semi_and_prunes(spark, sf_tiny):
    from pyspark.sql import functions as F

    from xorfilter_net_spark.relational import filter_pruned_join, prune_stats

    o = spark.read.parquet(f"{sf_tiny}/orders.parquet")
    c = spark.read.parquet(f"{sf_tiny}/customer.parquet").filter(
        F.col("c_acctbal") > 5000
    )
    semi = filter_pruned_join(o, c, "o_custkey", "c_custkey", how="left_semi")
    want = o.join(c, o.o_custkey == c.c_custkey, "left_semi")
    assert semi.count() == want.count()
    st = prune_stats(o, c, "o_custkey", "c_custkey")
    # probing actually prunes (selective dim) and never loses a match
    assert st["kept_rows"] < st["fact_rows"]
    assert st["kept_rows"] >= st["true_matches"]


def test_filter_pruned_join_rejects_outer(spark, sf_tiny):
    import pytest as _pytest

    from xorfilter_net_spark.relational import filter_pruned_join

    o = spark.read.parquet(f"{sf_tiny}/orders.parquet")
    c = spark.read.parquet(f"{sf_tiny}/customer.parquet")
    with _pytest.raises(ValueError, match="outer-join"):
        filter_pruned_join(o, c, "o_custkey", "c_custkey", how="left_outer")


# -- bucketed co-located join -------------------------------------------------
def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    from pyspark.sql import functions as F

    from xorfilter_net_spark.sources.sinks import write_bucketed

    spark.sql("drop table if exists bt_orders")
    spark.sql("drop table if exists bt_lineitem")
    orders = spark.range(0, 10_000).select(
        F.col("id").alias("o_key"), (F.col("id") % 100).alias("o_attr")
    )
    items = spark.range(0, 30_000).select(
        (F.col("id") % 10_000).alias("l_key"), F.col("id").alias("l_val")
    )
    write_bucketed(orders, "bt_orders", ["o_key"], 8, sort_cols=["o_key"])
    write_bucketed(items, "bt_lineitem", ["l_key"], 8, sort_cols=["l_key"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("bt_orders").join(
            spark.table("bt_lineitem"),
            F.col("o_key") == F.col("l_key"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        # bucket layout satisfies the join distribution on BOTH sides:
        # the 100TB recurring-join plan has no exchange at all
        assert "Exchange" not in plan, plan[:2000]
        assert j.count() == 30_000
        # and aggregation on the bucket key is shuffle-free too
        agg = spark.table("bt_lineitem").groupBy("l_key").count()
        assert "Exchange" not in agg._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("drop table if exists bt_orders")
        spark.sql("drop table if exists bt_lineitem")


class TestQuantileBins:
    """Sketch-driven equal-count binning (relational/binning.py)."""

    def test_assign_bins_arithmetic(self, spark):
        from xorfilter_net_spark.relational import assign_bins

        df = spark.createDataFrame([(v,) for v in range(1, 11)], "v int")
        out = {
            r["v"]: r["bucket"]
            for r in assign_bins(df, "v", [2.0, 5.0, 8.0]).collect()
        }
        # <=2 -> 1, (2,5] -> 2, (5,8] -> 3, >8 -> 4
        assert out == {1: 1, 2: 1, 3: 2, 4: 2, 5: 2, 6: 3, 7: 3, 8: 3,
                       9: 4, 10: 4}
        # map-only: no exchange anywhere in the assignment plan
        plan = (
            assign_bins(df, "v", [2.0, 5.0, 8.0])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan

    def test_cutpoints_monotone_and_balanced(self, spark):
        import numpy as np

        from xorfilter_net_spark.relational import quantile_bins

        rng = np.random.default_rng(11)
        vals = rng.lognormal(3.0, 1.2, size=4000)
        df = spark.createDataFrame(
            [(float(v),) for v in vals], "x double"
        ).repartition(8)
        binned, cuts = quantile_bins(df, "x", 5, k=256)
        assert cuts == sorted(cuts) and len(cuts) == 4
        counts = {
            r["bucket"]: r["count"] for r in binned.groupBy("bucket").count().collect()
        }
        assert set(counts) == {1, 2, 3, 4, 5}
        for b, c in counts.items():
            assert abs(c / 4000 - 0.2) <= 0.05, (b, c)

    def test_exact_ntile_matches_window(self, spark):
        """exact_ntile (distributed two-pass rank) must be bit-identical
        to the ntile() window under a total order, across bucket counts
        that exercise both the uneven split and the N<B degenerate."""
        import numpy as np

        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from xorfilter_net_spark.relational.binning import exact_ntile

        rng = np.random.default_rng(3)
        rows = [(int(i), int(v)) for i, v in
                enumerate(rng.integers(0, 50, size=997))]
        df = spark.createDataFrame(rows, "id long, x long").repartition(7)
        for b in (1, 4, 8, 1500):
            got = {
                (r["id"]): r["bucket"]
                for r in exact_ntile(df, ["x", "id"], b).collect()
            }
            w = Window.orderBy("x", "id")
            want = {
                r["id"]: r["bucket"]
                for r in df.select(
                    "id", F.ntile(b).over(w).alias("bucket")
                ).collect()
            }
            assert got == want, f"b={b}"

    def test_exact_ntile_null_keys_match_window(self, spark):
        """Null order keys must follow Spark's NULLS FIRST window
        semantics (land in the first buckets), not crash the driver-side
        boundary sort or leak into the last bucket — including nulls in
        a non-leading order column (lexicographic null-aware compare)."""
        import numpy as np

        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from xorfilter_net_spark.relational.binning import exact_ntile

        rng = np.random.default_rng(11)
        rows = []
        for i in range(600):
            x = None if i % 7 == 0 else int(rng.integers(0, 40))
            y = None if i % 11 == 0 else int(rng.integers(0, 5))
            rows.append((i, x, y))
        df = spark.createDataFrame(rows, "id long, x long, y long").repartition(5)
        for b in (3, 8):
            got = {
                r["id"]: r["bucket"]
                for r in exact_ntile(df, ["x", "y", "id"], b).collect()
            }
            w = Window.orderBy("x", "y", "id")
            want = {
                r["id"]: r["bucket"]
                for r in df.select(
                    "id", F.ntile(b).over(w).alias("bucket")
                ).collect()
            }
            assert got == want, f"b={b}"

    def test_exact_ntile_empty(self, spark):
        from xorfilter_net_spark.relational.binning import exact_ntile

        df = spark.createDataFrame([], "id long, x long")
        assert exact_ntile(df, ["x", "id"], 4).count() == 0

    def test_partitioning_invariance(self, spark):
        """Cutpoints from 2 vs 16 partitions agree within the rank bound
        (merge order must not matter materially)."""
        import numpy as np

        from xorfilter_net_spark.relational import quantile_cutpoints

        rng = np.random.default_rng(5)
        vals = sorted(float(v) for v in rng.normal(0, 10, size=3000))
        rows = [(v,) for v in vals]
        a = quantile_cutpoints(
            spark.createDataFrame(rows, "x double").repartition(2), "x", 4
        )
        b = quantile_cutpoints(
            spark.createDataFrame(rows, "x double").repartition(16), "x", 4
        )
        arr = np.asarray(vals)
        for ca, cb in zip(a, b):
            ra = np.searchsorted(arr, ca) / len(arr)
            rb = np.searchsorted(arr, cb) / len(arr)
            assert abs(ra - rb) <= 0.04, (ca, cb, ra, rb)


class TestSkewAwareJoin:
    def _data(self, spark):
        big_rows = (
            [("hot", i) for i in range(300)]
            + [("a", i) for i in range(20)]
            + [("b", i) for i in range(10)]
            + [("orphan", 1), ("orphan", 2)]  # key absent from small
            + [(None, 7), (None, 8)]  # NULL join keys
        )
        big = spark.createDataFrame(big_rows, "k string, v int").repartition(6)
        small = spark.createDataFrame(
            [("hot", 100), ("a", 200), ("b", 300), ("coldonly", 400)],
            "k string, payload int",
        )
        return big, small

    @staticmethod
    def _norm(df):
        rows = [tuple(r) for r in df.collect()]
        return sorted(
            rows,
            key=lambda t: tuple(
                (x is None, "" if x is None else str(x)) for x in t
            ),
        )

    def test_row_identical_to_plain_join(self, spark):
        from xorfilter_net_spark.relational.salted import skew_aware_join

        big, small = self._data(spark)
        for how in ("inner", "left"):
            got = skew_aware_join(big, small, "k", phi_e6=200_000, how=how)
            want = big.join(small, "k", how)
            assert self._norm(got) == self._norm(want), how

    def test_hot_key_detected_and_broadcast(self, spark):
        from xorfilter_net_spark.relational.salted import skew_aware_join

        big, small = self._data(spark)
        plan = skew_aware_join(
            big, small, "k", phi_e6=200_000
        )._jdf.queryExecution().executedPlan().toString()
        # the hot branch joins map-side; the cold branch remains
        assert "BroadcastHashJoin" in plan

    def test_no_hot_keys_falls_back_to_plain_join(self, spark):
        from xorfilter_net_spark.relational.salted import skew_aware_join

        big = spark.createDataFrame(
            [(f"k{i}", i) for i in range(100)], "k string, v int"
        )
        small = spark.createDataFrame(
            [(f"k{i}", i * 10) for i in range(100)], "k string, payload int"
        )
        got = skew_aware_join(big, small, "k", phi_e6=500_000)
        assert self._norm(got) == self._norm(big.join(small, "k"))
