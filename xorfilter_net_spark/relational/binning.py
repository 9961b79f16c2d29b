"""Sketch-driven equal-count binning (the scale path for ntile).

``ntile(k) OVER (ORDER BY col)`` is exact but plans a single-partition
global sort — unusable at corpus scale. The standard large-scale
substitute is a two-pass split:

1. one cheap corpus pass folds ``col`` into a mergeable KLL quantile
   sketch (``sketches/kll.py``; two-phase ``mapInPandas`` partials +
   ``treeAggregate`` merge — the same shape as every sketch here), whose
   1/k .. (k-1)/k quantile estimates become the bin cutpoints;
2. a map-only codegen pass assigns ``bucket = 1 + sum(col > cut_i)`` —
   a flat chain of comparisons, zero shuffle, zero Python, trivially
   parallel at any cluster size.

Accuracy inherits KLL's published rank-error bound (rank error eps with
high probability for sketch size O((1/eps) * sqrt(log(1/delta)))): each
produced bin's mass is within ~2*eps of 1/k, independent of data size.
The exact ``ntile`` window (``q_ntile_doc_length_buckets``) doubles as
the small-scale oracle.

Reference parity note: the reference library (XORFilter.Net) has no
quantile surface at all — this is part of the mandated north_rule sketch
family applied as a training-data curation primitive (quality tiers,
length-balanced sampling strata).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantile_cutpoints(
    df: DataFrame, col: str, n_bins: int, k: int = 256, seed: int = 7
) -> list[float]:
    """One distributed pass -> ``n_bins - 1`` approximate cutpoints."""
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    from ..sketches.base import aggregate
    from ..sketches.kll import KllSketch

    sk = KllSketch(k=k, value_col=col, seed=seed)
    st = aggregate(df.select(col), [col], sk)
    return [float(sk.quantile(st, i / n_bins)) for i in range(1, n_bins)]


def assign_bins(
    df: DataFrame, col: str, cutpoints: list[float], out_col: str = "bucket"
) -> DataFrame:
    """Map-only codegen bin assignment: ``1 + sum(col > cut_i)``.

    Values <= cut_1 land in bucket 1, values > the last cut in bucket
    ``len(cutpoints) + 1`` — identical tie handling to ``ntile`` when the
    cutpoints are the exact quantile boundaries.
    """
    c = F.col(col)
    bucket = F.lit(1)
    for cut in cutpoints:
        bucket = bucket + F.when(c > F.lit(cut), 1).otherwise(0)
    return df.withColumn(out_col, bucket.cast("int"))


def quantile_bins(
    df: DataFrame,
    col: str,
    n_bins: int,
    out_col: str = "bucket",
    k: int = 256,
    seed: int = 7,
) -> tuple[DataFrame, list[float]]:
    """Two-pass equal-count binning; returns (binned df, cutpoints)."""
    cuts = quantile_cutpoints(df, col, n_bins, k=k, seed=seed)
    return assign_bins(df, col, cuts, out_col=out_col), cuts


def exact_ntile(
    df: DataFrame,
    order_cols: list[str],
    n_buckets: int,
    out_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT ``ntile(n) OVER (ORDER BY order_cols)`` without the
    single-partition global sort — the distributed two-pass rank idiom:

    1. ``repartitionByRange`` + in-partition sort puts the corpus in
       global order across partitions (one range shuffle; the input is
       persisted so both passes see the same partitioning);
    2. a P-row count-per-partition collect gives each partition its
       global rank offset (the only driver data: one long per
       partition);
    3. a map-only pass adds local position to the offset and applies
       the exact ntile split (first ``N mod B`` buckets get
       ``ceil(N/B)`` rows).

    Output = input columns + ``out_col``. Bit-identical to the window
    ``ntile`` whenever ``order_cols`` is a total order (add a unique
    tiebreaker column, as ``ntile``'s peer-row nondeterminism does
    otherwise). Scale: the range exchange is the only corpus shuffle;
    no stage ever sees more than one partition of rows.
    """
    import pandas as pd

    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    cols = list(df.columns)
    p = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    rp = (
        df.repartitionByRange(p, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    try:
        counts = {
            int(r["__pid"]): int(r["n"])
            for r in rp.groupBy("__pid")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        total = sum(counts.values())
        offsets, off = {}, 0
        for pid in sorted(counts):
            offsets[pid] = off
            off += counts[pid]
        q, r = divmod(total, n_buckets)

        def assign(batches):
            local = 0
            pid_off = None
            for pdf in batches:
                if not len(pdf):
                    continue
                if pid_off is None:
                    pid_off = offsets[int(pdf["__pid"].iloc[0])]
                import numpy as np

                rank = pid_off + local + np.arange(len(pdf), dtype=np.int64)
                local += len(pdf)
                if q == 0:
                    bucket = rank + 1  # more buckets than rows
                else:
                    head = r * (q + 1)
                    bucket = np.where(
                        rank < head,
                        rank // (q + 1) + 1,
                        (rank - head) // q + r + 1,
                    )
                out = pdf[cols].copy()
                out[out_col] = bucket.astype(np.int32)
                yield out

        schema = rp.drop("__pid").schema.add(out_col, "integer")
        result = rp.mapInPandas(assign, schema=schema)
        # materialize before unpersist so the offsets stay valid
        result = result.localCheckpoint(eager=True)
        return result
    finally:
        rp.unpersist()
