"""TPC-H-shape relational queries (SURVEY.md §2.2 "Joins" row).

The driver's correctness gate compares every registered query against
its DuckDB oracle at sf0.01; these tests pin the *physical* properties
the 100 TB argument rests on (pushdown, broadcast pruning, no stray
shuffles) plus a tiny-scale value check so failures localize without a
full contract run.

Reference parity note: the reference (XORFilter.Net) has no relational
operators at all (SURVEY.md §2.2 marks joins "absent"); these queries
are engine-side Spark constructs the library pipeline needs.
"""

from __future__ import annotations

import duckdb
import pytest

from xorfilter_net_spark import entrypoints

NEW_TPCH = [
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q10_returned_items",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q19_disjunctive_revenue",
    "q22_global_sales_opportunity",
]


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_registry_has_tpch_queries_and_oracles():
    for name in NEW_TPCH:
        assert name in entrypoints.QUERIES, name
        assert name in entrypoints.ORACLES, name


def test_q6_is_zero_shuffle_pushdown_scan(spark, sf_tiny):
    df = entrypoints.QUERIES["q6_forecast_revenue"](spark, sf_tiny)
    plan = _plan(df)
    # all four predicates reach the parquet scan
    assert "PushedFilters:" in plan
    pushed = plan.split("PushedFilters: ")[1].splitlines()[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, (col, pushed)
    # scan-side agg only: the single exchange is the 1-row final agg
    assert "BroadcastHashJoin" not in plan
    assert plan.count("Exchange") <= 1


def test_star_joins_broadcast_their_dims(spark, sf_tiny):
    for name in ("q7_volume_shipping", "q8_market_share",
                 "q9_product_type_profit", "q10_returned_items",
                 "q19_disjunctive_revenue"):
        plan = _plan(entrypoints.QUERIES[name](spark, sf_tiny))
        assert "BroadcastHashJoin" in plan, name
        # no dim table ever shuffles: every SortMergeJoin/ShuffledHashJoin
        # (if any) is the single fact-fact orderkey join
        fact_joins = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
        assert fact_joins <= 1, (name, fact_joins)


def test_q19_superset_predicates_push_to_both_scans(spark, sf_tiny):
    plan = _plan(entrypoints.QUERIES["q19_disjunctive_revenue"](spark, sf_tiny))
    assert "In(p_brand" in plan  # part-side brand superset pushed
    # lineitem-side quantity hull pushed
    assert "GreaterThanOrEqual(l_quantity,1.0)" in plan
    assert "LessThanOrEqual(l_quantity,30.0)" in plan


def test_q22_antijoin_side_is_prefiltered(spark, sf_tiny):
    plan = _plan(entrypoints.QUERIES["q22_global_sales_opportunity"](spark, sf_tiny))
    assert "LeftAnti" in plan
    assert "EqualTo(o_orderpriority,1-URGENT)" in plan  # pushed to orders scan


@pytest.mark.parametrize("name", ["q6_forecast_revenue",
                                  "q13_customer_distribution",
                                  "q15_top_supplier"])
def test_values_match_duckdb_at_tiny_scale(spark, sf_tiny, name):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{sf_tiny}/{t}.parquet')"
        )
    spdf = entrypoints.QUERIES[name](spark, sf_tiny).toPandas()
    dpdf = con.execute(entrypoints.ORACLES[name]).df()
    assert len(spdf) == len(dpdf), name
    a = spdf[sorted(spdf.columns)].sort_values(sorted(spdf.columns)).reset_index(drop=True)
    b = dpdf[sorted(dpdf.columns)].sort_values(sorted(dpdf.columns)).reset_index(drop=True)
    for c in a.columns:
        assert (a[c].astype(str) == b[c].astype(str)).all(), (name, c)
