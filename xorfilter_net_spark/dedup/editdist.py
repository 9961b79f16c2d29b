"""Exact edit-distance similarity join — PassJoin-style pigeonhole
segmenting (Li, Deng, Feng, VLDB'11 "PASS-JOIN: A Partition-based Method
for Similarity Joins").

Finds ALL pairs within Levenshtein distance ``max_dist`` without an
all-pairs comparison. Pigeonhole: partition one string of a pair into
``d+1`` contiguous segments; at most ``d`` edit operations exist, so at
least one segment survives verbatim in the other string, and the indels
preceding it shift its position by at most ``d``. Candidate generation is
therefore an equi-join:

  - seg side: each string of length ``l >= d+1`` emits its ``d+1``
    segments keyed ``(i, l, segment_value)``;
  - sub side: each string of length ``m`` emits, for every plausible
    seg-side length ``l in [m-d, m+d]`` and every position shift in
    ``[-d, d]``, the substring that segment ``i`` of a length-``l``
    partner could map to — keyed the same way.

Both sides are pure whole-stage codegen (``explode`` over literal index
arrays + ``substring`` arithmetic); the ONLY shuffle carries
``(i, l, segment)`` keys of ~``l/(d+1)`` chars — raw strings ride along
once, never fan out O(n²). Verification is the JVM ``levenshtein``
(codegen), so no Python executes anywhere. Zero false negatives by the
pigeonhole argument — the registered query's oracle is the NAIVE
all-pairs join, so the blocking's exactness is value-checked, not
assumed.

Pairs whose id-smaller string is shorter than ``d+1`` chars cannot be a
seg side; both members of such a pair are then at most ``2d`` chars, and
that degenerate pool is handled by a tiny explicit all-pairs block.

Generation factor is O(d²) rows per string (75 at d=2, before distinct),
independent of corpus size; candidate count tracks true-pair count on
real text (segments of length ~16 rarely collide by chance). At 100 TB
the seg key can be swapped for ``xxhash64(segment)`` to shuffle 8 bytes
instead of the segment text, at the cost of a (verified-away) collision
superset — same trade the span-dedup operator exposes via ``carry``.

No reference counterpart (mandated beyond-reference dedup family;
complements minhash.py's probabilistic Jaccard path with a deterministic
edit-metric path, like prefix_join.py does for token overlap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["editdist_join"]


def _pair_cols(a: str = "a", b: str = "b") -> list:
    return [
        F.col(f"{a}.id").alias("id_a"),
        F.col(f"{a}.key").alias("key_a"),
        F.col(f"{b}.id").alias("id_b"),
        F.col(f"{b}.key").alias("key_b"),
    ]


def editdist_join(
    df: DataFrame, id_col: str, key_col: str, max_dist: int = 2
) -> DataFrame:
    """All pairs (id_a < id_b) with levenshtein(key_a, key_b) <= max_dist.

    Returns (id_a, id_b, dist). NULL keys are ignored. Exact — zero false
    negatives, zero false positives.
    """
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    d = max_dist
    k = d + 1
    strs = (
        df.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(key_col).alias("key"),
        )
        .filter(F.col("key").isNotNull())
        .withColumn("l", F.length("key"))
        # four subtrees (seg, sub, both degenerate pools) read this;
        # persist makes it one source scan instead of one per subtree
        # (same precedent as triangle_counts' edge cache)
        .persist()
    )
    idx = F.array(*[F.lit(i) for i in range(k)])
    shifts = F.array(*[F.lit(s) for s in range(-d, d + 1)])
    # even k-partition of a length-lp string: first lp%k segments are one
    # char longer; segment i starts (1-based) at
    #   i*floor(lp/k) + min(i, lp%k) + 1  and has length
    #   floor(lp/k) + (i < lp%k).
    seg_start = f"i * cast(lp / {k} as int) + least(i, lp % {k}) + 1"
    seg_len = f"cast(lp / {k} as int) + if(i < lp % {k}, 1, 0)"

    # seg side: the d+1 segments of every string of length >= k (lp = l).
    seg = (
        strs.filter(F.col("l") >= k)
        .withColumn("i", F.explode(idx))
        .withColumn("lp", F.col("l"))
        .select(
            "id",
            "key",
            "i",
            "lp",
            F.expr(f"substring(key, {seg_start}, {seg_len})").alias("seg"),
        )
        .dropDuplicates(["id", "lp", "i", "seg"])
    )

    # sub side: for every plausible seg-side length lp and shift, the
    # substring that segment i of a length-lp partner could align to.
    sub = (
        strs.withColumn("i", F.explode(idx))
        .withColumn("lp", F.explode(F.sequence(F.col("l") - d, F.col("l") + d)))
        .filter(F.col("lp") >= k)
        .withColumn("shift", F.explode(shifts))
        .withColumn("start", F.expr(seg_start) + F.col("shift"))
        .withColumn("slen", F.expr(seg_len))
        .filter(
            (F.col("start") >= 1)
            & (F.col("slen") >= 1)
            & (F.col("start") + F.col("slen") - 1 <= F.col("l"))
        )
        .select(
            "id",
            "key",
            "i",
            "lp",
            F.expr("substring(key, start, slen)").alias("seg"),
        )
        .dropDuplicates(["id", "lp", "i", "seg"])
    )

    cand = (
        seg.alias("a")
        .join(
            sub.alias("b"),
            ["i", "lp", "seg"],
        )
        .filter(F.col("a.id") < F.col("b.id"))
        .select(*_pair_cols())
    )

    # degenerate pool: pairs whose id-smaller member is < k chars. Both
    # members are then <= 2d chars; explicit all-pairs over that pool.
    pool = strs.filter(F.col("l") <= 2 * d)
    tiny = pool.filter(F.col("l") <= d)
    shorts = (
        tiny.alias("a")
        .join(pool.alias("b"), F.col("a.id") < F.col("b.id"))
        .select(*_pair_cols())
        .unionByName(
            pool.alias("a")
            .join(tiny.alias("b"), F.col("a.id") < F.col("b.id"))
            .select(*_pair_cols())
        )
    )

    return (
        cand.unionByName(shorts)
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("dist", F.levenshtein("key_a", "key_b"))
        .filter(F.col("dist") <= d)
        .select("id_a", "id_b", F.col("dist").cast("int").alias("dist"))
    )
