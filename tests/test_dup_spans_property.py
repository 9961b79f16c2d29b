"""Hypothesis differential tests for duplicated-span dedup: the Spark
operator (dedup/spans.py) vs a direct pure-Python re-derivation of the
ExactSubstr definition, over adversarial tiny-alphabet corpora (small
alphabets maximize gram collisions, within-doc repeats and overlapping
islands — the regimes the example tests can't enumerate)."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from xorfilter_net_spark.dedup.spans import (
    duplicated_spans,
    strip_duplicated_spans,
)

corpora = st.lists(
    st.lists(st.sampled_from("ab"), min_size=1, max_size=12),
    min_size=1,
    max_size=5,
)


def _py_spans(docs: dict[int, str], k: int, min_count: int = 2):
    grams: Counter = Counter()
    per_doc: dict[int, list[str]] = {}
    for d, t in docs.items():
        ws = (t or "").split(" ")
        gs = [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)]
        per_doc[d] = gs
        grams.update(gs)
    spans = []
    covered: dict[int, set] = {d: set() for d in docs}
    for d, gs in per_doc.items():
        hits = [i for i, g in enumerate(gs) if grams[g] >= min_count]
        cur = None
        for p in hits:
            covered[d].update(range(p, p + k))
            if cur is not None and p <= cur[1]:
                cur = (cur[0], max(cur[1], p + k - 1))
            else:
                if cur is not None:
                    spans.append((d, *cur))
                cur = (p, p + k - 1)
        if cur is not None:
            spans.append((d, *cur))
    return sorted(spans), covered


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpora, k=st.integers(2, 4))
def test_spans_and_strip_match_python_reference(spark, corpus, k):
    docs = {i: " ".join(toks) for i, toks in enumerate(corpus)}
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    want_spans, covered = _py_spans(docs, k)

    got_spans = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(df, k=k).collect()
    )
    assert got_spans == want_spans

    got_strip = {
        r.doc_id: (r.clean_text, r.kept_tokens, r.dropped_tokens)
        for r in strip_duplicated_spans(df, k=k).collect()
    }
    for d, t in docs.items():
        ws = t.split(" ")
        kept = [w for i, w in enumerate(ws) if i not in covered[d]]
        assert got_strip[d] == (
            " ".join(kept),
            len(kept),
            len(ws) - len(kept),
        ), (d, t, k)
