"""sources/formats.py: multi-format round-trip parity, schema-pinning
requirement, and the documented text-format caveats (null vs empty
string in CSV) actually biting — the reason the registered query
projects to unambiguous primitives."""

from __future__ import annotations

import tempfile

import pytest

from xorfilter_net_spark.sources.formats import read_dataset, roundtrip_dataset


def test_roundtrip_all_formats_parity(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 1.5, 10),
            (2, "b,with,commas", -2.25, None),
            (3, None, 0.0, 7),
            (3, None, 0.0, 7),  # duplicate row: parity is multiset
        ],
        "id long, s string, v double, n long",
    )
    root = tempfile.mkdtemp(prefix="fmt_")
    out = {
        r["format"]: (r["n_rows"], r["parity"])
        for r in roundtrip_dataset(df, root).collect()
    }
    assert set(out) == {"parquet", "orc", "json", "csv"}
    for fmt, (n, parity) in out.items():
        assert n == 4, fmt
        assert parity, fmt


def test_csv_null_vs_empty_caveat(spark):
    # the documented caveat: CSV conflates '' and NULL -> parity False
    df = spark.createDataFrame([(1, "")], "id long, s string")
    root = tempfile.mkdtemp(prefix="fmt_")
    out = {
        r["format"]: r["parity"]
        for r in roundtrip_dataset(df, root, formats=("csv", "json")).collect()
    }
    assert out["csv"] is False  # '' came back as NULL
    assert out["json"] is True  # JSON distinguishes them


def test_text_reads_require_schema(spark):
    with pytest.raises(ValueError):
        read_dataset(spark, "/nonexistent", "csv")
    with pytest.raises(ValueError):
        read_dataset(spark, "/nonexistent", "json")
