"""Unigram-LM tokenizer training (SentencePiece-style, Kudo ACL'18).

The second tokenizer family beside BPE (``text/bpe.py``): a unigram
language model over subword pieces, trained by EM and pruned to a
target vocabulary; encoding is Viterbi segmentation.

Distributed shape — the same scale insight as BPE: every statistic is a
function of the **word frequency table**, so the corpus is touched once
(word counts, one shuffle) and everything else runs at vocab scale:

- **seed vocabulary**: all substrings (≤ ``max_piece_len``) of distinct
  words exploded in codegen, weighted by word count, top-``max_seed``
  by total weight (single characters always kept — they guarantee every
  word stays encodable);
- **EM iteration**: broadcast piece log-probs; a ``mapInPandas`` pass
  over the word table runs the forward-backward lattice per distinct
  word and emits (piece, expected_count × word_count) partials, summed
  in one vocab-sized aggregate; the M-step renormalizes on the driver;
- **prune**: drop the lowest-expected-count multi-char pieces
  (``prune_frac`` per round) until ``vocab_size`` remains, re-running
  EM between rounds (the standard simplification of SentencePiece's
  loss-based prune);
- **encode**: Viterbi per word in a map-only Arrow kernel (ties break
  toward the LONGER piece then lexicographically — pinned so the
  differential test and both engines agree).

Differential evidence (tests/test_unigram_lm.py): a pure-Python
implementation of the same E/M/prune/Viterbi math must produce the
same piece probabilities (to float-sum tolerance) and the identical
segmentation. Iterative algorithm -> rows-only driver gate.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "word_counts",
    "seed_vocab",
    "train_unigram",
    "encode_unigram",
]

NEG_INF = float("-inf")


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    words = df.select(
        F.explode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
        ).alias("word")
    ).filter(F.col("word") != "")
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


def seed_vocab(
    wc: DataFrame, max_piece_len: int = 6, max_seed: int = 2000
) -> list[str]:
    """Top substrings by count-weighted frequency + all single chars."""
    subs = wc.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, length(word)), i -> "
                f"transform(sequence(1, least({max_piece_len}, "
                "length(word) - i + 1)), l -> substring(word, i, l))))"
            )
        ).alias("piece"),
        "cnt",
    )
    scored = (
        subs.groupBy("piece")
        .agg(F.sum("cnt").alias("w"))
        .orderBy(F.desc("w"), "piece")
    )
    top = [r["piece"] for r in scored.limit(max_seed).collect()]
    chars = [
        r["piece"] for r in scored.filter(F.length("piece") == 1).collect()
    ]
    seen = set(top)
    return top + [c for c in chars if c not in seen]


# ---------------------------------------------------------------------------
# lattice math (shared verbatim by the executor kernel and the pure-
# Python test reference — module-level so both import THE SAME code,
# the differential then checks the distributed orchestration)
# ---------------------------------------------------------------------------
def forward_backward_counts(
    word: str, logp: dict[str, float], max_len: int
) -> dict[str, float]:
    """Expected piece counts for one word under the unigram model."""
    n = len(word)
    fwd = [NEG_INF] * (n + 1)
    fwd[0] = 0.0
    edges: list[list[tuple[int, str, float]]] = [[] for _ in range(n + 1)]
    for i in range(n):
        if fwd[i] == NEG_INF:
            continue
        for j in range(i + 1, min(i + max_len, n) + 1):
            p = word[i:j]
            lp = logp.get(p)
            if lp is None:
                continue
            edges[j].append((i, p, lp))
            cand = fwd[i] + lp
            fwd[j] = cand if fwd[j] == NEG_INF else _logadd(fwd[j], cand)
    if fwd[n] == NEG_INF:
        return {}
    bwd = [NEG_INF] * (n + 1)
    bwd[n] = 0.0
    for j in range(n, 0, -1):
        if bwd[j] == NEG_INF:
            continue
        for i, p, lp in edges[j]:
            cand = bwd[j] + lp
            bwd[i] = cand if bwd[i] == NEG_INF else _logadd(bwd[i], cand)
    z = fwd[n]
    out: dict[str, float] = {}
    for j in range(1, n + 1):
        for i, p, lp in edges[j]:
            if fwd[i] == NEG_INF or bwd[j] == NEG_INF:
                continue
            gamma = math.exp(fwd[i] + lp + bwd[j] - z)
            out[p] = out.get(p, 0.0) + gamma
    return out


def viterbi_segment(
    word: str, logp: dict[str, float], max_len: int
) -> list[str]:
    """Best segmentation; ties -> longer piece, then lexicographic."""
    n = len(word)
    best = [NEG_INF] * (n + 1)
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    best[0] = 0.0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            if best[i] == NEG_INF:
                continue
            p = word[i:j]
            lp = logp.get(p)
            if lp is None:
                continue
            cand = best[i] + lp
            cur = back[j]
            if (
                cand > best[j]
                or (
                    cand == best[j]
                    and cur is not None
                    and (len(p), p) > (len(cur[1]), cur[1])
                )
            ):
                best[j] = cand
                back[j] = (i, p)
    if back[n] is None:
        return [word]  # unencodable (never happens with char coverage)
    out: list[str] = []
    j = n
    while j > 0:
        i, p = back[j]  # type: ignore[misc]
        out.append(p)
        j = i
    return out[::-1]


def _logadd(a: float, b: float) -> float:
    if a < b:
        a, b = b, a
    return a + math.log1p(math.exp(b - a))


# ---------------------------------------------------------------------------
# distributed EM
# ---------------------------------------------------------------------------
def _estep(wc: DataFrame, logp: dict[str, float], max_len: int) -> dict:
    def gen(batches):
        acc: dict[str, float] = {}
        for pdf in batches:
            for word, cnt in zip(pdf["word"], pdf["cnt"]):
                for p, c in forward_backward_counts(
                    word, logp, max_len
                ).items():
                    acc[p] = acc.get(p, 0.0) + c * int(cnt)
        if acc:
            yield pd.DataFrame(
                {"piece": list(acc), "c": list(acc.values())}
            )

    rows = (
        wc.mapInPandas(gen, schema="piece string, c double")
        .groupBy("piece")
        .agg(F.sum("c").alias("c"))
        .collect()
    )
    return {r["piece"]: r["c"] for r in rows}


def train_unigram(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 64,
    max_piece_len: int = 6,
    max_seed: int = 2000,
    em_iters: int = 2,
    prune_frac: float = 0.2,
) -> dict[str, float]:
    """Train; returns {piece: log_prob} of the final vocabulary."""
    wc = word_counts(df, text_col).persist()
    wc.count()
    pieces = seed_vocab(wc, max_piece_len, max_seed)
    logp = {p: -math.log(len(pieces)) for p in pieces}
    try:
        while True:
            for _ in range(em_iters):
                counts = _estep(wc, logp, max_piece_len)
                total = sum(counts.values()) or 1.0
                # guard the RATIO: a denormal-tiny expected count can be
                # > 0 yet underflow to 0.0 after the division
                logp = {
                    p: math.log(c / total)
                    for p, c in counts.items()
                    if c / total > 0.0
                }
                # char coverage floor: single chars may never vanish
                floor = math.log(1e-9 / total) if total else -30.0
                for p in pieces:
                    if len(p) == 1 and p not in logp:
                        logp[p] = floor
            multi = [p for p in logp if len(p) > 1]
            singles = [p for p in logp if len(p) == 1]
            if len(logp) <= vocab_size or not multi:
                break
            keep_n = max(
                len(multi) - max(1, int(len(multi) * prune_frac)),
                max(0, vocab_size - len(singles)),
            )
            if keep_n >= len(multi):
                break
            counts_now = _estep(wc, logp, max_piece_len)
            ranked = sorted(
                multi,
                key=lambda p: (-counts_now.get(p, 0.0), p),
            )
            kept = set(ranked[:keep_n]) | set(singles)
            logp = {p: lp for p, lp in logp.items() if p in kept}
            pieces = list(logp)
    finally:
        wc.unpersist()
    return logp


def encode_unigram(
    df: DataFrame,
    logp: dict[str, float],
    text_col: str = "text",
    out_col: str = "pieces",
    max_piece_len: int = 6,
) -> DataFrame:
    """Viterbi-segment every row's words — map-only Arrow kernel."""
    lp = dict(logp)

    def gen(batches):
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            out = []
            for t in pdf[text_col]:
                toks: list[str] = []
                for w in (t or "").split(" "):
                    if not w:
                        continue
                    if w not in cache:
                        cache[w] = viterbi_segment(w, lp, max_piece_len)
                    toks.extend(cache[w])
                out.append(toks)
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(gen, schema=f"{fields}, {out_col} array<string>")
