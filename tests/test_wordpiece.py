"""WordPiece (text/wordpiece.py): textbook pure-Python training
differential (exact Fraction scoring, same tie order), an INDEPENDENT
greedy-longest-match property verifier for the encoder, and edge cases.
"""

from __future__ import annotations

from collections import Counter
from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from xorfilter_net_spark.sources.session import load_table
from xorfilter_net_spark.text.wordpiece import (
    UNK,
    encode_wordpiece,
    train_wordpiece,
    vocab_pieces,
    wordpiece_vocab_set,
)


def _py_train(texts, num_merges, min_count=2):
    words: Counter = Counter()
    for t in texts:
        for w in (t or "").split(" "):
            if w:
                words[w] += 1
    segs = {w: list(w) for w in words}
    merges = []
    for _ in range(num_merges):
        pc: Counter = Counter()
        sc: Counter = Counter()
        for w, c in words.items():
            s = segs[w]
            for sym in s:
                sc[sym] += c
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        cand = [(l, r, c) for (l, r), c in pc.items() if c >= min_count]
        if not cand:
            break
        bf = max(Fraction(c, sc[l] * sc[r]) for l, r, c in cand)
        tied = [x for x in cand if Fraction(x[2], sc[x[0]] * sc[x[1]]) == bf]
        l, r, c = min(tied, key=lambda x: (-x[2], x[0], x[1]))
        merges.append((l, r, c))
        for w in segs:
            out = []
            for s in segs[w]:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            segs[w] = out
    return merges, segs


@pytest.fixture(scope="module")
def trained(spark, sf_tiny):
    docs = load_table(spark, sf_tiny, "documents").select("doc_id", "text")
    merges, vocab = train_wordpiece(docs, num_merges=8)
    return docs, merges, vocab


class TestWordPieceTraining:
    def test_merges_match_python_textbook(self, trained, spark, sf_tiny):
        docs, merges, _ = trained
        texts = [r["text"] for r in docs.collect()]
        py_merges, _ = _py_train(texts, num_merges=8)
        assert [(m.left, m.right, m.pair_count) for m in merges] == py_merges

    def test_final_segmentation_matches_python(self, trained):
        docs, _, vocab = trained
        texts = [r["text"] for r in docs.collect()]
        _, py_segs = _py_train(texts, num_merges=8)
        got = {r["word"]: list(r["sym"]) for r in vocab.collect()}
        assert got == py_segs

    def test_scores_strictly_positive_and_counts_consistent(self, trained):
        _, merges, _ = trained
        for m in merges:
            assert 0 < m.pair_count <= min(m.left_count, m.right_count)


class TestWordPieceEncode:
    def test_greedy_property_and_reconstruction(self, trained, spark):
        docs, _, vocab = trained
        pieces = wordpiece_vocab_set(vocab)
        enc = encode_wordpiece(docs, pieces, "doc_id", "text").select(
            "doc_id", "text", "wp_tokens"
        )
        rows = enc.limit(200).collect()
        assert rows
        for r in rows:
            toks = list(r["wp_tokens"])
            words = [w for w in (r["text"] or "").split(" ") if w]
            # re-segment word stream independently and verify greedy
            i = 0
            for w in words:
                target = w
                if toks[i] == UNK:
                    i += 1
                    continue
                pos = 0
                while pos < len(target):
                    tok = toks[i]
                    surface = tok[2:] if tok.startswith("##") and pos else tok
                    assert target[pos : pos + len(surface)] == surface
                    # greedy: no strictly longer piece matches here
                    prefix = "##" if pos else ""
                    for e in range(len(target), pos + len(surface), -1):
                        assert prefix + target[pos:e] not in pieces
                    pos += len(surface)
                    i += 1
            assert i == len(toks)

    def test_unknown_word_is_unk(self, trained, spark):
        _, _, vocab = trained
        pieces = wordpiece_vocab_set(vocab)
        df = spark.createDataFrame(
            [(1, "\x01\x02"), (2, None), (3, "")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: list(r["wp_tokens"])
            for r in encode_wordpiece(df, pieces, "doc_id", "text").collect()
        }
        assert out[1] == [UNK]
        assert out[2] == []
        assert out[3] == []

    def test_vocab_pieces_shapes(self, trained):
        _, _, vocab = trained
        vp = vocab_pieces(vocab).collect()
        assert all(r["n_words"] >= 1 and r["total_cnt"] >= 1 for r in vp)
        # continuation and initial forms both present somewhere
        assert any(r["piece"].startswith("##") for r in vp)
        assert any(not r["piece"].startswith("##") for r in vp)


class TestEncodeOracleLongWords:
    def test_duckdb_oracle_covers_long_words(self):
        """The r04 recursive-walk rewrite of _wp_encode_oracle must
        handle words that segment into MANY pieces (the r03 fixed
        steps=12 unroll tripped its -1 sentinel on >12-piece words even
        though Spark was correct). Pure-DuckDB differential against a
        textbook greedy encode — no Spark needed."""
        import duckdb

        from xorfilter_net_spark.entrypoints import _wp_encode_oracle

        # corpus engineered so the 20-char word segments into ~20
        # single-char pieces (its chars never co-occur often enough to
        # merge); shared high-frequency words drive the 10 merges
        long_word = "zqxjvwkfpbymdhgtrnls"
        texts = [
            ("the the data data stream stream " + long_word),
            "the data stream group group agg agg",
            "the data stream the data stream",
        ]
        rows = list(enumerate(texts))

        merges, segs = _py_train(texts, num_merges=10)
        pieces = {
            (s if i == 0 else "##" + s)
            for seg in segs.values()
            for i, s in enumerate(seg)
        }

        def py_encode(word):
            if len(word) > 200:
                return (1, 1)
            pos, nt = 0, 0
            while pos < len(word):
                for ln in range(len(word) - pos, 0, -1):
                    cand = ("" if pos == 0 else "##") + word[pos : pos + ln]
                    if cand in pieces:
                        break
                else:
                    return (1, 1)
                pos += ln
                nt += 1
            return (nt, 0)

        want = {}
        for doc_id, t in rows:
            nt = nu = 0
            for w in t.split(" "):
                if w:
                    a, b = py_encode(w)
                    nt, nu = nt + a, nu + b
            want[doc_id] = (nt, nu)

        con = duckdb.connect()
        con.execute("create table documents (doc_id bigint, text varchar)")
        con.executemany("insert into documents values (?, ?)", rows)
        got = {
            int(r[0]): (int(r[1]), int(r[2]))
            for r in con.sql(_wp_encode_oracle()).fetchall()
        }
        assert -1 not in got, "walk-unfinished sentinel fired"
        # the long word must genuinely exceed the old 12-step bound
        assert py_encode(long_word)[0] > 12
        assert got == want
