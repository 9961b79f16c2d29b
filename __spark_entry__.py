"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``xorfilter_net_spark.entrypoints`` — the driver runs
``entry(spark)`` as a smoke check, each ``queries()[name]`` at sf=0.01,
and compares against ``oracle_sql()[name]`` via DuckDB (row-count +
schema + order-insensitive value-hash).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from xorfilter_net_spark import entrypoints  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return entrypoints.entry(spark)


def _already_green() -> set[str]:
    """Names with a green row in ANY prior round's CORRECTNESS file."""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    green: set[str] = set()
    for p in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            rounds = json.load(open(p))
        except Exception:
            continue
        if not isinstance(rounds, dict):
            continue
        for name, row in rounds.items():
            if not isinstance(row, dict) or row.get("err"):
                continue
            rows_only = name not in entrypoints.ORACLES
            if (
                row.get("rows_match", True) is not False
                and row.get("schema_match", True) is not False
                # rows-only queries have no value hash to match, so a
                # missing/None hash field still counts as verified for
                # them; value-checkable queries need hash_match=True —
                # a row written before the oracle existed (or by a
                # format without the hash field) must NOT deprioritize
                # an unverified query in the rotation
                and (row.get("hash_match") is True or rows_only)
            ):
                green.add(name)
    return green


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry, ordered for maximal cumulative driver-oracle coverage:
    queries WITHOUT a green row in a prior round's CORRECTNESS file come
    first (cheapest first, per the measured sf0.01 wall costs in
    tools/query_costs.json), already-verified ones after. A driver that
    samples a prefix — by count or by time budget — therefore always
    spends its budget on unverified queries; semantics of each entry are
    unchanged."""
    import json

    qs = dict(entrypoints.QUERIES)
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        costs = json.load(open(os.path.join(here, "tools/query_costs.json")))
    except Exception:
        costs = {}
    green = _already_green()
    order = sorted(
        qs, key=lambda n: (n in green, costs.get(n, 3.0), n)
    )
    return {n: qs[n] for n in order}


def oracle_sql() -> dict[str, str]:
    return dict(entrypoints.ORACLES)
