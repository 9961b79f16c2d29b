"""Deterministic hash-based sampling / train-val splits.

``df.sample(fraction)`` is seeded per-partition: the selected rows
change whenever partitioning changes, which silently breaks
reproducible train/val splits across reruns, repartitions, and engine
versions. The pipeline-grade alternative keys the decision on row
CONTENT: a row is sampled iff a stable hash of its key columns falls
under a threshold. Properties a 100 TB pipeline needs:

- reproducible across runs, partitionings, cluster sizes, and engines
  (md5 is everywhere — the DuckDB oracle runs the same expression);
- consistent: a document keeps its split assignment when the corpus
  grows (the decision depends only on the row, so incremental batches
  land in the same split);
- map-only — no shuffle, no sort, no sampling pass.

The first 12 hex chars of md5 (48 bits) are compared lexicographically
against a threshold prefix; 48 bits keeps the realized fraction within
~1e-7 of the target without bigint-hex conversions (which DuckDB and
Spark spell differently).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 12


def _threshold_hex(fraction: float) -> str:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    v = round(fraction * 16**_HEX_DIGITS)
    if v >= 16**_HEX_DIGITS:
        # every 12-hex-char bucket sorts before 'g' -> keep everything;
        # the threshold must stay exactly _HEX_DIGITS wide otherwise
        # (a wider string breaks the lexicographic compare)
        return "g"
    return format(v, f"0{_HEX_DIGITS}x")


def _bucket(cols: list[str]) -> Column:
    return F.substring(F.md5(F.concat_ws("\x1f", *cols)), 1, _HEX_DIGITS)


def sample_hash(df: DataFrame, cols: list[str], fraction: float) -> DataFrame:
    """Keep rows whose content hash over ``cols`` falls under ``fraction``."""
    return df.filter(_bucket(cols) < F.lit(_threshold_hex(fraction)))


def split_hash(
    df: DataFrame, cols: list[str], val_fraction: float, col_name: str = "split"
) -> DataFrame:
    """Label rows 'val' / 'train' deterministically by content hash."""
    is_val = _bucket(cols) < F.lit(_threshold_hex(val_fraction))
    return df.withColumn(col_name, F.when(is_val, "val").otherwise("train"))


def sample_sql(cols_expr: str, fraction: float) -> str:
    """The identical predicate as engine-portable SQL (used by oracles)."""
    return f"substr(md5({cols_expr}), 1, {_HEX_DIGITS}) < '{_threshold_hex(fraction)}'"


def stratified_sample_hash(
    df: DataFrame, group_cols: list[str], key_cols: list[str], k: int
) -> DataFrame:
    """Deterministic per-group quota sample: the ``k`` rows of each group
    whose content hash sorts first (ties broken by the key itself).

    The training-data use case is per-stratum caps — "at most k documents
    per language / per source" — where ``df.sampleBy`` would be
    non-reproducible across partitionings and fractions can't express an
    absolute quota. Hash order is content-keyed, so the selection is
    stable across runs, engines, cluster sizes, AND corpus growth: a row
    only drops out of the sample when a lower-hashed row arrives in its
    group (reservoir-like displacement, never reshuffling survivors at
    random). One shuffle on ``group_cols`` (window row_number); at scale
    a pre-aggregation isn't possible (quota needs a global per-group
    rank) but the shuffle carries only the input rows — Spark's
    WindowExec streams each group, and AQE handles group skew."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*group_cols).orderBy(_bucket(key_cols), *key_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def stratified_sample_sql(
    table: str, group_cols: str, key_cols_expr: str, key_order: str, k: int
) -> str:
    """DuckDB oracle for :func:`stratified_sample_hash` (same ordering)."""
    return (
        f"select * exclude (__rn) from (select *, row_number() over ("
        f"partition by {group_cols} order by "
        f"substr(md5({key_cols_expr}), 1, {_HEX_DIGITS}), {key_order}) as __rn "
        f"from {table}) t where __rn <= {k}"
    )
