"""Distributed BPE tokenizer training (training-data pipeline operator).

Byte-pair encoding (Sennrich et al., ACL 2016) learned over the corpus —
the tokenizer-training job that precedes any LM training run. The
scale shape exploits BPE's defining property: merges depend only on the
**word frequency table**, so the corpus is touched exactly once:

1. **word count** (the ONLY corpus-sized shuffle): ``explode(split)`` →
   ``groupBy(word).count()``. 100 TB of text collapses to its distinct
   words (Heaps' law: ~10^7-10^8 rows), cached for the loop.
2. **merge loop** (vocab-sized, m iterations): adjacent symbol pairs per
   word via a codegen ``transform(sequence(...))`` weighted by word
   count → ``groupBy(pair).sum`` → the argmax pair (count desc, then
   lexicographic — a total, engine-independent order) crosses to the
   driver as ONE row; the merge is applied to every word's symbol array
   by a pure-codegen ``aggregate`` fold (greedy left-to-right, the
   textbook semantics — no Python ever touches a row). Each iteration
   persists and cuts lineage so plans stay O(1) deep.

The loop is inherently iterative (merge i+1's counts depend on merge i)
— exactly the class the driver contract exempts from SQL oracles; the
strong check is the differential test against a pure-Python textbook
BPE in tests/test_bpe.py (identical merge table, identical final
segmentation), plus the rows-only driver gate.

No reference counterpart (reference is membership-only; mandated
training-pipeline operator).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END = "</w>"


@dataclass(frozen=True)
class BpeMerge:
    rank: int
    left: str
    right: str
    pair_count: int


def _chars_with_end(word: Column) -> Column:
    return F.concat(F.split(word, ""), F.array(F.lit(END)))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    pairs = F.expr(
        "transform(sequence(1, size(sym) - 1), "
        "i -> struct(element_at(sym, i) as l, element_at(sym, i + 1) as r))"
    )
    return (
        vocab.filter(F.size("sym") >= 2)
        .select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").alias("c"))
    )


def merge_fold(sym: Column | str, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) -> left+right
    over a symbol array, as a single codegen ``aggregate`` fold."""
    return F.aggregate(
        sym,
        F.expr("cast(array() as array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(left + right)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt, sym) — the one corpus-sized pass."""
    words = df.select(
        F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), " ")).alias(
            "word"
        )
    ).filter(F.col("word") != "")
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt")).select(
        "word", "cnt", _chars_with_end(F.col("word")).alias("sym")
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 20,
    min_count: int = 2,
) -> tuple[list[BpeMerge], DataFrame]:
    """Learn ``num_merges`` BPE merges; returns (merges, final vocab).

    The returned vocab DataFrame is (word, cnt, sym) with ``sym`` the
    final segmentation of each distinct word — persisted; caller
    unpersists. Stops early when the best pair count drops below
    ``min_count``. Ties break deterministically: highest count, then
    lexicographically smallest (left, right).
    """
    vocab = word_vocab(df, text_col).persist()
    vocab.count()
    merges: list[BpeMerge] = []
    for rank in range(num_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("c"), "l", "r")
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < min_count:
            break
        l, r, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append(BpeMerge(rank, l, r, c))
        nxt = vocab.select(
            "word", "cnt", merge_fold("sym", l, r).alias("sym")
        ).persist()
        nxt.count()
        vocab.unpersist()
        vocab = nxt
    return merges, vocab


def encode_with_merges(
    df: DataFrame,
    merges: list[BpeMerge],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Segment each row's words with a learned merge table, entirely in
    codegen: per-word fold chain in merge-rank order inside a
    ``transform`` over the word array, then flatten.

    Plan size grows with len(merges) (one nested fold per merge) — right
    for bounded merge tables; a production-size table (30k+) would move
    the same greedy loop into a vectorized pandas UDF over the DISTINCT
    words and broadcast-join the segmentation back (word-table shape,
    same as training).
    """

    def seg(word: Column) -> Column:
        sym = _chars_with_end(word)
        for m in merges:
            sym = merge_fold(sym, m.left, m.right)
        return sym

    words = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda w: w != "",
    )
    return df.withColumn(
        out_col, F.flatten(F.transform(words, seg))
    )


def encode_with_merges_distinct(
    df: DataFrame,
    merges: list[BpeMerge],
    id_col: str,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """The production-scale encode path the codegen variant's docstring
    promises: run the greedy merge loop ONCE PER DISTINCT WORD in an
    Arrow-batched pandas kernel (word-table shape — Heaps' law makes
    distinct words ~10^7-10^8 at 100 TB, vs 10^11+ word occurrences),
    then join the segmentation back to the corpus word stream and
    reassemble per-row token arrays in word order.

    vs ``encode_with_merges``: identical output (property-tested in
    tests/test_bpe.py — the Python loop replicates merge_fold's greedy
    left-to-right semantics symbol for symbol), but plan depth is O(1)
    in the merge-table size where the codegen path nests one fold per
    merge — 30k+ merges would blow past codegen limits there.

    Shuffles: the distinct-word aggregate, the word-keyed join-back
    (AQE broadcasts when the segmentation table fits, hash join
    co-keyed on word otherwise), and the per-row regroup. Raw text
    crosses the wire once, as (id, pos, word).
    """
    import pandas as pd

    merge_list = [(m.left, m.right) for m in sorted(merges, key=lambda m: m.rank)]

    def _segment(batches):
        for pdf in batches:
            pieces = []
            for w in pdf["word"]:
                syms = list(w) + [END]
                for left, right in merge_list:
                    if len(syms) < 2:
                        break
                    out: list[str] = []
                    for s in syms:
                        if out and out[-1] == left and s == right:
                            out[-1] = left + right
                        else:
                            out.append(s)
                    syms = out
                pieces.append(syms)
            yield pd.DataFrame({"word": pdf["word"], "pieces": pieces})

    words = df.select(
        F.col(id_col),
        F.posexplode(
            F.filter(
                F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
                lambda w: w != "",
            )
        ).alias("pos", "word"),
    )
    seg = (
        words.select("word")
        .distinct()
        .mapInPandas(_segment, "word string, pieces array<string>")
    )
    grouped = (
        words.join(seg, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "pieces"))),
                    lambda s: s["pieces"],
                )
            ).alias(out_col)
        )
    )
    return df.join(grouped, id_col, "left").withColumn(
        out_col,
        F.coalesce(out_col, F.expr("cast(array() as array<string>)")),
    )


def merges_df(spark, merges: list[BpeMerge]) -> DataFrame:
    return spark.createDataFrame(
        [(m.rank, m.left, m.right, m.pair_count) for m in merges],
        "rank int, left string, right string, pair_count bigint",
    )
