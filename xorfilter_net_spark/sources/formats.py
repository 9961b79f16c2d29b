"""Multi-format dataset round-trips — every batch file format Spark
ships (parquet, ORC, JSON lines, CSV) through the same skew-proof
``write_dataset`` layout, with schema-pinned read-back.

Scans/sources coverage (SURVEY.md §2.2): the engine's production path
is parquet/Iceberg, but pipeline edges are routinely text formats —
vendor drops arrive as CSV/JSONL, exports leave the same way. The scale
rules don't change: the writer keeps the bounded-files-per-directory
layout, and the reader ALWAYS pins an explicit schema for the text
formats (schema inference is a full extra pass over 100 TB and can
silently widen types between runs — never let it run in production).

``roundtrip_dataset`` is the self-checking form: write + read each
format and verify multiset row parity against the source (exceptAll in
both directions — order-insensitive, duplicate-aware).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .sinks import write_dataset

__all__ = ["read_dataset", "roundtrip_dataset"]

_TEXT_FORMATS = {"csv", "json"}


def read_dataset(spark, path: str, format: str, schema=None) -> DataFrame:
    """Schema-pinned read. For csv/json a schema is REQUIRED (inference
    is an extra corpus pass and non-deterministic across data drift)."""
    reader = spark.read.format(format)
    if format in _TEXT_FORMATS:
        if schema is None:
            raise ValueError(
                f"{format} reads require an explicit schema at scale"
            )
        reader = reader.schema(schema)
        if format == "csv":
            reader = reader.option("header", "true")
    elif schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def roundtrip_dataset(
    df: DataFrame,
    root: str,
    formats: tuple[str, ...] = ("parquet", "orc", "json", "csv"),
    files_per_partition: int = 4,
) -> DataFrame:
    """Write ``df`` in each format under ``root/<format>``, read each
    back with the source schema, and return one row per format:
    (format, n_rows, parity) where parity is exact multiset equality.

    Caveats encoded here rather than discovered in production: CSV
    cannot distinguish null from empty string and both text formats
    re-parse timestamps through a format string — callers should
    project such columns to unambiguous primitives first (the
    registered query uses ``unix_micros``)."""
    spark = df.sparkSession
    rows = []
    for fmt in formats:
        path = f"{root}/{fmt}"
        write_dataset(
            df,
            path,
            files_per_partition=files_per_partition,
            format=fmt,
            options={"header": "true"} if fmt == "csv" else None,
        )
        back = read_dataset(spark, path, fmt, schema=df.schema)
        n = back.count()
        parity = (
            df.exceptAll(back).count() == 0
            and back.exceptAll(df).count() == 0
        )
        rows.append((fmt, n, bool(parity)))
    return spark.createDataFrame(
        rows, "format string, n_rows long, parity boolean"
    )
