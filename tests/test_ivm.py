"""pipeline/ivm.py + timetravel pre/post-image CDF: delta semantics
(incl. group-vanish, NULL group keys, new-group inserts), the
maintenance==recomputation contract, image-feed validation, and
registered-query oracle parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xorfilter_net_spark.pipeline.ivm import agg_view, apply_changes


def view_of(df):
    return {
        r["g"]: (r["n"], r["sum_v"]) for r in df.collect()
    }


@pytest.fixture(scope="module")
def base(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 5), (4, None, 7)],
        "id long, g string, v long",
    )


def test_maintenance_equals_recompute(spark, base):
    changes = spark.createDataFrame(
        [
            (5, "a", 100, "insert"),          # existing group
            (6, "c", 9, "insert"),            # brand-new group
            (3, "b", 5, "delete"),            # group 'b' vanishes
            (2, "a", 20, "update_preimage"),  # 20 -> 21
            (2, "a", 21, "update_postimage"),
            (4, None, 7, "update_preimage"),  # NULL group maintained
            (4, None, 8, "update_postimage"),
        ],
        "id long, g string, v long, change_type string",
    )
    got = view_of(apply_changes(agg_view(base, ["g"], ["v"]), changes, ["g"], ["v"]))
    final = spark.createDataFrame(
        [
            (1, "a", 10), (2, "a", 21), (5, "a", 100),
            (6, "c", 9), (4, None, 8),
        ],
        "id long, g string, v long",
    )
    want = view_of(agg_view(final, ["g"], ["v"]))
    assert got == want
    assert "b" not in got  # vanished group dropped, as recompute would
    assert got[None] == (1, 8)


def test_group_moving_update(spark, base):
    # an update that MOVES a row between groups: retract from old group,
    # add to new — both sides maintained by the same two image rows
    changes = spark.createDataFrame(
        [(3, "b", 5, "update_preimage"), (3, "a", 5, "update_postimage")],
        "id long, g string, v long, change_type string",
    )
    got = view_of(apply_changes(agg_view(base, ["g"], ["v"]), changes, ["g"], ["v"]))
    assert "b" not in got
    assert got["a"] == (3, 35)


def test_unknown_change_type_raises(spark, base):
    changes = spark.createDataFrame(
        [(9, "a", 1, "update")],  # post-only image: irretractable
        "id long, g string, v long, change_type string",
    )
    out = apply_changes(agg_view(base, ["g"], ["v"]), changes, ["g"], ["v"])
    with pytest.raises(Exception, match="ivm: unknown change_type"):
        out.collect()


def test_cdf_pre_post_images(spark, sf_tiny):
    import tempfile

    from xorfilter_net_spark.sources.timetravel import (
        create_table, merge_into, table_changes,
    )

    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k long, v long"
    )
    path = tempfile.mkdtemp(prefix="ivm_cdf_") + "/t"
    create_table(df, path, "k", n_buckets=4)
    delta = spark.createDataFrame(
        [(2, 21, False), (3, 30, True), (4, 40, False)],
        "k long, v long, __del boolean",
    )
    merge_into(spark, path, delta, deleted_col="__del")
    rows = sorted(
        (r["k"], r["v"], r["change_type"])
        for r in table_changes(spark, path, 0, 1, images="pre_post").collect()
    )
    assert rows == [
        (2, 20, "update_preimage"),
        (2, 21, "update_postimage"),
        (3, 30, "delete"),
        (4, 40, "insert"),
    ]
    with pytest.raises(ValueError):
        table_changes(spark, path, 0, 1, images="bogus")


def test_registered_query_matches_duckdb(spark, sf_tiny):
    import duckdb

    from xorfilter_net_spark import entrypoints

    got = sorted(
        tuple(r)
        for r in entrypoints.QUERIES["ivm_agg_view_documents"](
            spark, sf_tiny
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{sf_tiny}/documents.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            entrypoints.ORACLES["ivm_agg_view_documents"]
        ).fetchall()
    )
    assert got == want
    assert len(got) > 1
