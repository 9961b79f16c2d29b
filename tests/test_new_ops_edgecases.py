"""Empty/degenerate-input behavior of the newer operator families: an
operator fed zero rows must return zero rows with the right schema (not
throw) — the property composed pipelines rely on when a filter stage
drains."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def empty_events(spark):
    return spark.createDataFrame(
        [], "event_id long, user_id long, event_type string, "
        "value double, ts timestamp"
    )


def test_funnel_empty(spark, empty_events):
    from xorfilter_net_spark.relational.funnel import funnel_counts

    rows = funnel_counts(
        empty_events, "user_id", "ts", "event_type", ["a", "b"]
    ).collect()
    assert [(r["step_idx"], r["n_users"]) for r in rows] == [(1, 0), (2, 0)]


def test_cohort_empty(spark, empty_events):
    from xorfilter_net_spark.relational.cohort import cohort_retention

    assert cohort_retention(empty_events, "user_id", "ts").count() == 0


def test_scd2_empty_and_temporal(spark, empty_events):
    from xorfilter_net_spark.relational.scd import scd2_history, temporal_join

    hist = scd2_history(
        empty_events, "user_id", "event_type", "ts", "event_id"
    )
    assert hist.count() == 0
    assert (
        temporal_join(empty_events, hist.drop("is_current"), "user_id", "ts")
        .count()
        == 0
    )


def test_editdist_empty(spark):
    from xorfilter_net_spark.dedup.editdist import editdist_join

    df = spark.createDataFrame([], "id long, key string")
    assert editdist_join(df, "id", "key", 2).count() == 0


def test_assoc_empty(spark):
    from xorfilter_net_spark.relational.assoc import frequent_pairs

    df = spark.createDataFrame([], "g long, i string")
    assert frequent_pairs(df, "g", "i").count() == 0


def test_validate_empty_table(spark, empty_events):
    from xorfilter_net_spark.pipeline.validate import complete, unique, validate

    rows = {
        r["check"]: (r["n_rows"], r["n_violations"], r["passed"])
        for r in validate(
            empty_events, [complete("event_id"), unique("user_id")]
        ).collect()
    }
    # vacuous truth: zero rows violate nothing
    assert rows == {
        "complete(event_id)": (0, 0, True),
        "unique(user_id)": (0, 0, True),
    }


def test_profile_empty_table(spark, empty_events):
    from xorfilter_net_spark.pipeline.profile import profile_columns

    got = {
        r["col_name"]: r
        for r in profile_columns(empty_events, ["event_id", "event_type"])
        .collect()
    }
    assert got["event_id"]["n_rows"] == 0
    assert got["event_id"]["ndv"] == 0
    assert got["event_id"]["min_num"] is None


def test_ivm_empty_changes(spark):
    from xorfilter_net_spark.pipeline.ivm import agg_view, apply_changes

    base = spark.createDataFrame([(1, "a", 5)], "id long, g string, v long")
    view = agg_view(base, ["g"], ["v"])
    changes = spark.createDataFrame(
        [], "id long, g string, v long, change_type string"
    )
    out = {
        r["g"]: (r["n"], r["sum_v"])
        for r in apply_changes(view, changes, ["g"], ["v"]).collect()
    }
    assert out == {"a": (1, 5)}


def test_rolling_empty(spark, empty_events):
    from xorfilter_net_spark.sketches.rolling import rolling_distinct_exact

    assert (
        rolling_distinct_exact(empty_events, "user_id", "ts", 100).count()
        == 0
    )


def test_timeseries_empty(spark, empty_events):
    from xorfilter_net_spark.relational.timeseries import (
        gapfill_forward,
        resample_ohlc,
    )

    assert (
        resample_ohlc(
            empty_events, "event_type", "ts", "value", "event_id"
        ).count()
        == 0
    )
    assert gapfill_forward(empty_events, "user_id", "ts").count() == 0


def test_graph_empty(spark):
    from xorfilter_net_spark.relational.graph import (
        bfs_distances,
        kcore_subgraph,
        triangle_counts,
    )

    edges = spark.createDataFrame([], "a long, b long")
    assert triangle_counts(edges).count() == 0
    assert kcore_subgraph(edges, 2).count() == 0
    assert bfs_distances(edges, 3).count() == 0  # no source resolvable


def test_anomaly_trend_gini_empty(spark, empty_events):
    from xorfilter_net_spark.relational.stats import gini_by_group
    from xorfilter_net_spark.relational.timeseries import (
        grouped_trend,
        rolling_moment_anomalies,
    )

    assert rolling_moment_anomalies(empty_events, "value", "ts").count() == 0
    assert grouped_trend(
        empty_events, "event_type", "ts", "value"
    ).count() == 0
    assert gini_by_group(empty_events, "event_type", "value").count() == 0


def test_rolling_topk_and_grouped_empty(spark, empty_events):
    from xorfilter_net_spark.sketches.rolling import (
        rolling_distinct_exact,
        rolling_topk_mg,
    )

    assert rolling_topk_mg(empty_events, "event_type", "ts").count() == 0
    assert rolling_distinct_exact(
        empty_events, "user_id", "ts", 100, group_cols=["event_type"]
    ).count() == 0


def test_kmeans_empty_raises(spark):
    from xorfilter_net_spark.ann.kmeans import kmeans_fit

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="empty"):
        kmeans_fit(empty, "vec_id", "embedding", k=2, iters=1)


def test_wordpiece_empty_corpus(spark):
    from xorfilter_net_spark.text.wordpiece import (
        train_wordpiece,
        vocab_pieces,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    merges, vocab = train_wordpiece(empty, num_merges=3)
    assert merges == []
    assert vocab_pieces(vocab).count() == 0


def test_hits_empty_graph(spark):
    from xorfilter_net_spark.relational.pagerank import hits

    empty = spark.createDataFrame([], "src string, dst string, w long")
    assert hits(empty, iters=2).count() == 0


def test_moment_anomaly_store_empty(spark, tmp_path):
    from xorfilter_net_spark.streaming.rolling import (
        init_period_store,
        moment_anomalies_from_store,
    )

    store = str(tmp_path / "s")
    init_period_store(spark, store)
    assert moment_anomalies_from_store(spark, store).count() == 0


def test_roundtrip_empty_dataframe(spark, tmp_path):
    from xorfilter_net_spark.sources.formats import roundtrip_dataset

    empty = spark.createDataFrame([], "id long, s string")
    out = {
        r["format"]: (r["n_rows"], r["parity"])
        for r in roundtrip_dataset(
            empty, str(tmp_path / "fmt"), formats=("parquet", "json")
        ).collect()
    }
    assert out["parquet"] == (0, True)
    assert out["json"] == (0, True)


def test_delete_where_no_matching_keys(spark, tmp_path):
    from xorfilter_net_spark.sources.timetravel import (
        create_table,
        delete_where,
        read_table,
    )

    df = spark.range(20).selectExpr("id as k", "id * 2 as v")
    path = str(tmp_path / "t")
    create_table(df, path, "k", n_buckets=4)
    # delete keys that do not exist: rows unchanged, version advances
    res = delete_where(
        spark, path, spark.range(100, 105).selectExpr("id as k")
    )
    assert res["version"] == 1
    assert read_table(spark, path).count() == 20
