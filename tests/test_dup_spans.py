"""Duplicated n-gram span detection (dedup/spans.py) — unit invariants.

The driver-contract oracle (dup_span_report / dup_span_strip) checks
value-exactness vs DuckDB; these tests pin the operator's own contract:
span maximality/disjointness, zero coverage on a duplicate-free corpus,
carry='hash' parity, and the strip-stage reconstruction identity.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xorfilter_net_spark.dedup.spans import (
    duplicated_spans,
    strip_duplicated_spans,
)

K = 5


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_copy_yields_full_span(spark):
    text = " ".join(f"w{i}" for i in range(12))
    df = _corpus(spark, [(1, text), (2, text)])
    spans = duplicated_spans(df, k=K).collect()
    assert len(spans) == 2
    for r in spans:
        assert (r.span_start, r.span_end, r.span_tokens) == (0, 11, 12)


def test_unique_corpus_has_no_spans(spark):
    rows = [
        (i, " ".join(f"d{i}t{j}" for j in range(10))) for i in range(6)
    ]
    assert duplicated_spans(_corpus(spark, rows), k=K).count() == 0


def test_partial_overlap_span_is_maximal_and_tight(spark):
    shared = [f"s{i}" for i in range(8)]  # 8 shared tokens -> 4 dup 5-grams
    a = " ".join(["a0", "a1"] + shared + ["a2", "a3"])
    b = " ".join(["b0"] + shared + ["b1", "b2", "b3"])
    df = _corpus(spark, [(1, a), (2, b)])
    got = {
        r.doc_id: (r.span_start, r.span_end)
        for r in duplicated_spans(df, k=K).collect()
    }
    # spans cover exactly the shared run: positions of `shared` per doc
    assert got == {1: (2, 9), 2: (1, 8)}


def test_within_doc_repeat_counts(spark):
    # the same 5-token run twice INSIDE one doc (ExactSubstr counts
    # within-doc repeats): both occurrences are duplicated spans
    run = " ".join(f"r{i}" for i in range(K))
    df = _corpus(spark, [(1, f"{run} x0 x1 x2 {run}")])
    rows = duplicated_spans(df, k=K).collect()
    assert {(r.span_start, r.span_end) for r in rows} == {(0, 4), (8, 12)}


def test_adjacent_hits_merge_into_one_island(spark):
    # two docs sharing a 7-token run -> 3 overlapping dup 5-grams -> ONE span
    shared = " ".join(f"s{i}" for i in range(7))
    df = _corpus(spark, [(1, shared + " x0"), (2, "y0 " + shared)])
    spans = duplicated_spans(df, k=K)
    assert spans.filter("doc_id = 1").count() == 1


def test_carry_hash_matches_carry_gram(spark):
    rows = [
        (1, " ".join(f"w{i}" for i in range(20))),
        (2, " ".join(f"w{i}" for i in range(5, 25))),
        (3, " ".join(f"u{i}" for i in range(20))),
    ]
    df = _corpus(spark, rows)
    a = duplicated_spans(df, k=K, carry="gram")
    b = duplicated_spans(df, k=K, carry="hash")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_carry_validation(spark):
    df = _corpus(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="carry"):
        duplicated_spans(df, k=K, carry="bogus")


def test_strip_reconstruction_identity(spark):
    """kept + dropped == total tokens, and docs with no span are
    byte-identical to the input."""
    shared = " ".join(f"s{i}" for i in range(9))
    rows = [
        (1, shared + " a0 a1"),
        (2, "b0 b1 " + shared),
        (3, " ".join(f"c{i}" for i in range(11))),
    ]
    df = _corpus(spark, rows)
    out = strip_duplicated_spans(df, k=K)
    got = {r.doc_id: r for r in out.collect()}
    totals = {r.doc_id: len(r.text.split(" ")) for r in df.collect()}
    for did, r in got.items():
        assert r.kept_tokens + r.dropped_tokens == totals[did]
    assert got[3].clean_text == rows[2][1] and got[3].dropped_tokens == 0
    assert got[1].clean_text == "a0 a1"
    assert got[2].clean_text == "b0 b1"


def test_fully_duplicated_doc_strips_to_empty(spark):
    text = " ".join(f"t{i}" for i in range(K))
    out = strip_duplicated_spans(_corpus(spark, [(1, text), (2, text)]), k=K)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].clean_text == "" and rows[1].kept_tokens == 0
    assert rows[1].dropped_tokens == K


def test_short_docs_emit_nothing(spark):
    df = _corpus(spark, [(1, "a b"), (2, "a b"), (3, None)])
    assert duplicated_spans(df, k=K).count() == 0
    out = {r.doc_id: r for r in strip_duplicated_spans(df, k=K).collect()}
    assert out[1].clean_text == "a b"
    assert out[3].clean_text == "" and out[3].kept_tokens == 1  # [''] token
