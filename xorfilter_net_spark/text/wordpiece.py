"""Distributed WordPiece tokenizer training + encoding — the third
member of the tokenizer trio (with text/bpe.py and text/unigram_lm.py).

WordPiece (Schuster & Nakajima, ICASSP 2012; the BERT tokenizer) trains
like BPE but scores candidate merges by LIKELIHOOD GAIN rather than raw
frequency: pick the adjacent pair maximizing

    score(l, r) = count(lr) / (count(l) * count(r))

— the pair whose merge most increases a unigram LM's corpus likelihood.
Encoding is NOT merge-replay: it is greedy longest-match-first against
the final vocabulary, with non-initial pieces prefixed ``##`` and
unmatched words emitted as ``[UNK]``.

Scale shape (same insight as BPE — everything after one corpus pass is
word-table-sized):
1. **word count**: the ONLY corpus-sized shuffle (shared
   ``bpe.word_vocab``).
2. **merge loop** (m iterations, vocab-scale): symbol totals via one
   ``explode(sym)`` aggregate; pair counts via the shared codegen pair
   stream; the argmax-by-ratio is EXACT without ever collecting the
   pair table — a float64 pre-score ranks a top-``band`` candidate
   slice (float error ≪ band width), the slice crosses to the driver,
   and ``fractions.Fraction`` cross-multiplication picks the true
   maximum (count-desc / lexicographic tie order). Merges apply via the
   shared pure-codegen ``merge_fold``.
3. **encode**: greedy longest-match over the DISTINCT words in an
   Arrow-batched pandas kernel (word-table shape) + word-keyed
   join-back — the same production-scale plan as
   ``bpe.encode_with_merges_distinct``; plan depth O(1) in vocab size.

Iterative (merge i+1's counts depend on merge i) -> rows-only driver
gates; the strong checks are the pure-Python textbook differential and
the independent greedy-property verifier in tests/test_wordpiece.py.

No reference counterpart (reference is membership-only; mandated
training-pipeline operator family).
"""

from __future__ import annotations

from dataclasses import dataclass
from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import _pair_counts, merge_fold

UNK = "[UNK]"

__all__ = [
    "WordPieceMerge",
    "train_wordpiece",
    "vocab_pieces",
    "encode_wordpiece",
]


@dataclass(frozen=True)
class WordPieceMerge:
    rank: int
    left: str
    right: str
    pair_count: int
    left_count: int
    right_count: int


def _word_vocab_no_end(df: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt, sym) with sym = bare characters. WordPiece carries no
    end-of-word sentinel (unlike BPE's ``</w>``): the ``##`` continuation
    prefix on non-initial pieces is what distinguishes word positions,
    so a sentinel would only create encode-unmatchable pieces."""
    words = df.select(
        F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), " ")).alias(
            "word"
        )
    ).filter(F.col("word") != "")
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt")).select(
        "word", "cnt", F.split("word", "").alias("sym")
    )


def _symbol_counts(vocab: DataFrame) -> DataFrame:
    """(sym_s, sc): total weighted occurrences of each symbol across the
    current segmentation — one vocab-sized explode + aggregate."""
    return (
        vocab.select(F.explode("sym").alias("sym_s"), "cnt")
        .groupBy("sym_s")
        .agg(F.sum("cnt").alias("sc"))
    )


def train_wordpiece(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 20,
    min_count: int = 2,
    band: int = 64,
) -> tuple[list[WordPieceMerge], DataFrame]:
    """Learn ``num_merges`` likelihood-scored merges; returns
    (merges, final vocab as (word, cnt, sym))."""
    vocab = _word_vocab_no_end(df, text_col).persist()
    vocab.count()
    merges: list[WordPieceMerge] = []
    for rank in range(num_merges):
        syms = _symbol_counts(vocab)
        cand = (
            _pair_counts(vocab)
            .filter(F.col("c") >= min_count)
            .join(syms.withColumnRenamed("sym_s", "l").withColumnRenamed("sc", "lc"), "l")
            .join(syms.withColumnRenamed("sym_s", "r").withColumnRenamed("sc", "rc"), "r")
            # float64 pre-rank: one correctly-rounded division per pair;
            # the exact driver re-compare makes its ulp irrelevant as
            # long as the true argmax lands in the band (it sits at
            # relative float distance ~1e-16 from its own pre-score)
            .withColumn(
                "pre",
                F.col("c")
                / (F.col("lc").cast("double") * F.col("rc").cast("double")),
            )
            .orderBy(F.desc("pre"), F.desc("c"), "l", "r")
            .limit(band)
            .collect()
        )
        if not cand:
            break
        # exact rational argmax over the band; ties: highest pair count,
        # then lexicographically smallest (l, r)
        bf = max(
            Fraction(int(row["c"]), int(row["lc"]) * int(row["rc"]))
            for row in cand
        )
        tied = [
            row
            for row in cand
            if Fraction(int(row["c"]), int(row["lc"]) * int(row["rc"])) == bf
        ]
        best = min(tied, key=lambda row: (-int(row["c"]), row["l"], row["r"]))
        merges.append(
            WordPieceMerge(
                rank,
                best["l"],
                best["r"],
                int(best["c"]),
                int(best["lc"]),
                int(best["rc"]),
            )
        )
        nxt = vocab.select(
            "word", "cnt", merge_fold("sym", best["l"], best["r"]).alias("sym")
        ).persist()
        nxt.count()
        vocab.unpersist()
        vocab = nxt
    return merges, vocab


def vocab_pieces(final_vocab: DataFrame) -> DataFrame:
    """(piece, n_words, total_cnt) — the emitted vocabulary in WordPiece
    surface form: a piece is its symbol string with ``##`` prefixed when
    it never starts a word... surface form here is positional: the FIRST
    symbol of a word keeps its spelling, later symbols get ``##``.
    The same symbol can appear in both forms; both are emitted."""
    pieces = final_vocab.select(
        "cnt",
        F.expr(
            "transform(sym, (s, i) -> case when i = 0 then s else '##' || s end)"
        ).alias("pieces"),
    ).select(F.explode("pieces").alias("piece"), "cnt")
    return pieces.groupBy("piece").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("cnt").alias("total_cnt"),
    )


def encode_wordpiece(
    df: DataFrame,
    vocab: set[str],
    id_col: str,
    text_col: str = "text",
    out_col: str = "wp_tokens",
    max_word_len: int = 200,
) -> DataFrame:
    """BERT-style greedy longest-match-first encode against ``vocab``
    (a set of surface pieces: word-initial spellings and ``##``-prefixed
    continuations). Runs once per DISTINCT word in an Arrow-batched
    pandas kernel, joined back in word order — the production word-table
    shape shared with ``bpe.encode_with_merges_distinct``. Words longer
    than ``max_word_len`` or with an unmatchable position become
    ``[UNK]`` (the BERT semantics)."""
    import pandas as pd

    pieces = frozenset(vocab)

    def _one(word: str) -> list[str]:
        if not word or len(word) > max_word_len:
            return [UNK]
        out: list[str] = []
        pos = 0
        while pos < len(word):
            prefix = "##" if pos else ""
            end = len(word)
            while end > pos:
                cand = prefix + word[pos:end]
                if cand in pieces:
                    out.append(cand)
                    break
                end -= 1
            else:
                return [UNK]
            pos = end
        return out

    def _segment(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "pieces": [_one(w) for w in pdf["word"]],
                }
            )

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


def wordpiece_vocab_set(final_vocab: DataFrame) -> set[str]:
    """Driver-side surface-piece set for ``encode_wordpiece`` (vocab-
    sized collect — the piece table is tokenizer material, KBs-MBs)."""
    return {r["piece"] for r in vocab_pieces(final_vocab).collect()}
