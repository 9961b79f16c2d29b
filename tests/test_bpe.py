"""Distributed BPE training (text/bpe.py) — differential vs textbook BPE.

The merge loop is iterative (merge i+1 depends on merge i), so the
driver gate is rows-only; the strong correctness evidence lives here: a
pure-Python Sennrich-style BPE (greedy left-to-right apply, count-desc
then lexicographic tie-break) must produce the identical merge table and
identical final segmentation on the same corpus.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from xorfilter_net_spark.text.bpe import (
    END,
    encode_with_merges,
    encode_with_merges_distinct,
    train_bpe,
)


def _py_apply(seg: tuple, a: str, b: str) -> tuple:
    out: list = []
    for x in seg:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return tuple(out)


def py_bpe(texts, num_merges, min_count=2):
    """Textbook BPE over a word-frequency table."""
    vocab: Counter = Counter()
    for t in texts:
        for w in (t or "").split(" "):
            if w:
                vocab[w] += 1
    segs = {w: tuple(list(w) + [END]) for w in vocab}
    merges = []
    for _ in range(num_merges):
        pc: Counter = Counter()
        for w, cnt in vocab.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += cnt
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_count:
            break
        merges.append((a, b, c))
        segs = {w: _py_apply(s, a, b) for w, s in segs.items()}
    return merges, segs


CORPUS = [
    (1, "low low low low low lower lower newest newest newest"),
    (2, "newest newest newest widest widest widest new new low"),
    (3, "lowest newest wider wide wide low lower newest"),
    (4, None),
    (5, ""),
]


def test_merge_table_matches_textbook_bpe(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges, vocab = train_bpe(df, num_merges=12)
    ref_merges, _ = py_bpe([t for _, t in CORPUS], 12)
    got = [(m.left, m.right, m.pair_count) for m in merges]
    assert got == ref_merges
    vocab.unpersist()


def test_final_segmentation_matches_textbook_bpe(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges, vocab = train_bpe(df, num_merges=12)
    _, ref_segs = py_bpe([t for _, t in CORPUS], 12)
    got = {r["word"]: tuple(r["sym"]) for r in vocab.collect()}
    assert got == ref_segs
    vocab.unpersist()
    del merges


def test_encode_matches_training_segmentation(spark):
    """encode_with_merges over raw text == concatenation of the trained
    vocab's per-word segmentations, in word order."""
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges, vocab = train_bpe(df, num_merges=12)
    seg = {r["word"]: list(r["sym"]) for r in vocab.collect()}
    vocab.unpersist()
    enc = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in encode_with_merges(df, merges).collect()
    }
    for doc_id, text in CORPUS:
        want: list = []
        for w in (text or "").split(" "):
            if w:
                want += seg[w]
        assert enc[doc_id] == want


def test_distinct_encode_matches_codegen(spark):
    """encode_with_merges_distinct (pandas kernel over distinct words +
    join-back) == encode_with_merges (nested codegen folds), row for row
    — including NULL/empty texts and across partitionings."""
    df = spark.createDataFrame(CORPUS, "doc_id long, text string").repartition(3)
    merges, vocab = train_bpe(df, num_merges=12)
    vocab.unpersist()
    a = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in encode_with_merges(df, merges).collect()
    }
    b = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in encode_with_merges_distinct(df, merges, "doc_id").collect()
    }
    assert a == b


def test_early_stop_below_min_count(spark):
    df = spark.createDataFrame(
        [(1, "ab cd ef")], "doc_id long, text string"
    )
    merges, vocab = train_bpe(df, num_merges=10, min_count=2)
    vocab.unpersist()
    assert merges == []  # every pair occurs exactly once


def test_merges_are_deterministic_across_partitionings(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    m1, v1 = train_bpe(df.repartition(1), num_merges=8)
    m8, v8 = train_bpe(df.repartition(8), num_merges=8)
    v1.unpersist(), v8.unpersist()
    assert [(m.left, m.right, m.pair_count) for m in m1] == [
        (m.left, m.right, m.pair_count) for m in m8
    ]


def test_token_counts_on_documents(spark, sf_tiny):
    """Smoke at sf0.001: merges are non-empty and encoding shrinks the
    symbol stream monotonically vs characters."""
    docs = spark.read.parquet(f"{sf_tiny}/documents.parquet")
    merges, vocab = train_bpe(docs, num_merges=6)
    vocab.unpersist()
    assert len(merges) > 0
    enc = encode_with_merges(docs.limit(20), merges)
    row = enc.select(
        F.sum(F.size("bpe_tokens")).alias("n_bpe"),
        F.sum(
            F.length(F.regexp_replace(F.coalesce("text", F.lit("")), " ", ""))
        ).alias("n_chars"),
    ).collect()[0]
    assert 0 < row["n_bpe"] < row["n_chars"] + 20 * 60
