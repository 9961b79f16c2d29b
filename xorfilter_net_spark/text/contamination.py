"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation set.

The standard training-data hygiene pass (GPT-3 appendix C; Llama 2 §A.6;
Dodge et al., "Documenting Large Webtext Corpora", EMNLP 2021): a training
document is contaminated when a large fraction of its word n-grams also
appear in any benchmark/eval document. The reference library has no text
operators at all (it consumes opaque bytes, README.md:114) — this is one
of the mandated beyond-the-reference training-pipeline components.

Scale shape (the part that must hold at 100 TB):

- train-side shingling is pure whole-stage codegen (``split`` +
  ``transform(sequence(...))`` + ``array_distinct`` — no Python, no
  shuffle);
- the eval side is TINY by nature (benchmarks are MBs against a corpus of
  TBs), so its distinct shingle set is **broadcast** — the contamination
  join is map-side, the full training corpus is never shuffled;
- the only shuffle in the plan carries the MATCHED (doc_id, shingle)
  pairs — bounded by the contamination volume, not the corpus;
- per-doc totals come from ``size()`` on the shingle array in codegen,
  and the matched counts re-join the corpus through a second broadcast
  (the hit table is at most |eval-adjacent docs| rows).

The contamination decision is division-free integer arithmetic
(``n_matched * 100 >= pct * n_shingles``) so the same predicate is
bit-exact in any ANSI SQL engine (the DuckDB oracle runs it verbatim).

For eval sets too large to broadcast raw (unusual, but e.g. a full
held-out split), the intended composition is this module + the XOR/fuse
filter: build a filter over the eval shingle digests and pre-prune the
exploded train shingles with the zero-Python SQL probe before the exact
join — the same pattern as ``relational/filter_join.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["shingles_col", "contamination_report"]


def shingles_col(text_col: str | Column, n: int = 5) -> Column:
    """DISTINCT word ``n``-gram shingles of a space-tokenized text column,
    entirely in codegen. Documents with fewer than ``n`` tokens yield an
    empty array (NOT a [0, -1] descending ``sequence`` — guarded)."""
    tk = F.split(
        text_col if isinstance(text_col, Column) else F.col(text_col), " "
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size(tk) - n),
        lambda i: F.concat_ws(" ", F.slice(tk, i + 1, n)),
    )
    return F.when(F.size(tk) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold_pct: int = 50,
    prune: str = "broadcast",
) -> DataFrame:
    """Per-training-document contamination report against an eval set.

    Returns one row per training document that has at least one shingle:
    ``(id_col, n_shingles, n_matched, contaminated)`` where
    ``contaminated = n_matched * 100 >= threshold_pct * n_shingles``.

    ``eval_df`` needs only ``text_col``. See the module docstring for the
    plan shape; with ``prune='broadcast'`` (default) the eval shingle set
    is broadcast, so this performs zero shuffles of the training corpus.
    ``prune='xor'`` is the beyond-broadcast composition: the exploded
    train shingles are pre-pruned by a zero-Python XOR-filter probe of
    the eval shingle set BEFORE the exact semi-join
    (``relational/filter_join.py`` pattern) — row-identical output
    (zero false negatives; the FPR trickle dies in the exact join), with
    the semi-join shuffle carrying only ~matches + 2^-16 x |shingles|.
    """
    sh = f"__contam_sh"
    base = train.select(
        F.col(id_col), shingles_col(text_col, n).alias(sh)
    ).filter(F.size(sh) > 0)

    eval_shingles = (
        eval_df.select(F.explode(shingles_col(text_col, n)).alias(sh))
        .distinct()
    )
    exploded = base.select(id_col, F.explode(sh).alias(sh))
    if prune == "xor":
        from ..relational.filter_join import filter_pruned_join

        matched = filter_pruned_join(
            exploded, eval_shingles, sh, sh, how="left_semi"
        )
    else:
        matched = exploded.join(F.broadcast(eval_shingles), sh)
    hits = matched.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_matched"))
    report = (
        base.select(F.col(id_col), F.size(sh).alias("n_shingles"))
        .join(F.broadcast(hits), id_col, "left")
        .withColumn("n_matched", F.coalesce("n_matched", F.lit(0)))
        .withColumn(
            "contaminated",
            F.col("n_matched") * 100 >= F.lit(threshold_pct) * F.col("n_shingles"),
        )
    )
    return report
