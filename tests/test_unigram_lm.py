"""Unigram-LM tokenizer (text/unigram_lm.py) — differential vs a
single-machine replay of the same EM/prune/Viterbi math.

The lattice kernels (forward_backward_counts / viterbi_segment) are
shared module functions; the reference below re-runs the TRAINING LOOP
over a plain dict word table, so the differential isolates exactly
what Spark adds: the distributed seed-vocab aggregate, the mapInPandas
E-step partials, and the vocab-sized count reduction.
"""

from __future__ import annotations

import math
from collections import Counter

from xorfilter_net_spark.text.unigram_lm import (
    encode_unigram,
    forward_backward_counts,
    train_unigram,
    viterbi_segment,
)

CORPUS = [
    (1, "abab abab ababab cd cd"),
    (2, "abcd abab cdcd ababab"),
    (3, "xyz abab cd xyz"),
    (4, None),
]


def _py_word_counts(texts):
    wc: Counter = Counter()
    for t in texts:
        for w in (t or "").split(" "):
            if w:
                wc[w] += 1
    return wc


def _py_seed(wc, max_len, max_seed):
    weights: Counter = Counter()
    for w, c in wc.items():
        for i in range(len(w)):
            for l in range(1, min(max_len, len(w) - i) + 1):
                weights[w[i : i + l]] += c
    ranked = sorted(weights, key=lambda p: (-weights[p], p))
    top = ranked[:max_seed]
    seen = set(top)
    return top + [p for p in ranked if len(p) == 1 and p not in seen]


def _py_train(texts, vocab_size, max_len, max_seed, em_iters, prune_frac):
    wc = _py_word_counts(texts)
    pieces = _py_seed(wc, max_len, max_seed)
    logp = {p: -math.log(len(pieces)) for p in pieces}

    def estep(lp):
        acc: dict[str, float] = {}
        for w, c in wc.items():
            for p, g in forward_backward_counts(w, lp, max_len).items():
                acc[p] = acc.get(p, 0.0) + g * c
        return acc

    while True:
        for _ in range(em_iters):
            counts = estep(logp)
            total = sum(counts.values()) or 1.0
            logp = {
                p: math.log(c / total)
                for p, c in counts.items()
                if c / total > 0.0
            }
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
        counts_now = estep(logp)
        ranked = sorted(multi, key=lambda p: (-counts_now.get(p, 0.0), p))
        kept = set(ranked[:keep_n]) | set(singles)
        logp = {p: lp for p, lp in logp.items() if p in kept}
        pieces = list(logp)
    return logp


KW = dict(vocab_size=12, max_len=4, max_seed=60, em_iters=2, prune_frac=0.3)


def test_training_matches_single_machine_replay(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = train_unigram(
        df, vocab_size=KW["vocab_size"], max_piece_len=KW["max_len"],
        max_seed=KW["max_seed"], em_iters=KW["em_iters"],
        prune_frac=KW["prune_frac"],
    )
    want = _py_train([t for _, t in CORPUS], **KW)
    assert set(got) == set(want)
    for p in want:
        assert abs(got[p] - want[p]) < 1e-8, p


def test_learned_pieces_compress_repeats(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    logp = train_unigram(
        df, vocab_size=12, max_piece_len=4, max_seed=60, em_iters=3
    )
    assert "ab" in logp or "abab" in logp  # the dominant bigram survives
    enc = encode_unigram(df, logp, max_piece_len=4)
    rows = {r.doc_id: list(r.pieces) for r in enc.collect()}
    # every word reconstructs exactly
    for doc_id, t in CORPUS:
        joined = "".join(rows[doc_id])
        assert joined == (t or "").replace(" ", "")
    # 'ababab' segments into repeated learned pieces, not 6 chars
    seg = viterbi_segment("ababab", logp, 4)
    assert len(seg) <= 3


def test_every_word_encodable_via_char_floor(spark):
    df = spark.createDataFrame(
        [(1, "qqq zz qqq zz"), (2, "rare7word")], "doc_id long, text string"
    )
    logp = train_unigram(df, vocab_size=6, max_piece_len=3, max_seed=20)
    seg = viterbi_segment("rare7word", logp, 3)
    assert "".join(seg) == "rare7word"


def test_vocab_size_bound(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    logp = train_unigram(
        df, vocab_size=10, max_piece_len=4, max_seed=100, em_iters=1
    )
    singles = sum(1 for p in logp if len(p) == 1)
    assert len(logp) <= max(10, singles + 1)
