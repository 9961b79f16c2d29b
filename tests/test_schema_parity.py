"""Spark-vs-DuckDB output-schema CLASS parity over the whole contract.

The r02 incident class: a column whose Spark side is int64 but whose
oracle side widens (HUGEINT/DOUBLE) hash-mismatches in the driver's
comparison frame even with identical values. tools/schema_parity.py is
the guard; this test runs it over EVERY oracle-backed query at sf0.001
(the oracle side is DESCRIBE — planning only), so any future
int-vs-float / decimal drift fails the suite, not a driver round.
"""

from __future__ import annotations

import duckdb
import pytest

from tools.schema_parity import TABLES, run_parity


@pytest.fixture(scope="module")
def duck_views(sf_tiny):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"create view {t} as select * from "
            f"read_parquet('{sf_tiny}/{t}.parquet')"
        )
    return con


def test_schema_class_parity_all_oracles(spark, duck_views):
    bad = run_parity(spark, duck_views)
    assert not bad, bad
