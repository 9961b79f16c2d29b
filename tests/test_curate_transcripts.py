"""pipeline/curate_transcripts.py invariants on a hand-built corpus."""

from __future__ import annotations

import pytest

from xorfilter_net_spark.pipeline.curate_transcripts import (
    curate_transcript_pairs,
)


def _turns(conv_id, texts, roles=None):
    roles = roles or [
        ("user", "assistant", "tool")[i % 3] for i in range(len(texts))
    ]
    return [(conv_id, i, roles[i], texts[i]) for i in range(len(texts))]


@pytest.fixture(scope="module")
def pairs(spark):
    rows = (
        # c-a and c-b are exact duplicates -> only c-a survives
        _turns("c-a", ["hi there", "hello back friend", "ran tool ok", "thanks a lot"])
        + _turns("c-b", ["hi there", "hello back friend", "ran tool ok", "thanks a lot"])
        # c-c: too short (2 turns)
        + _turns("c-c", ["hey you", "yo right back"])
        # c-d: no assistant turn
        + _turns("c-d", ["a much longer user line", "another user line here",
                         "third user line text"], roles=["user"] * 3)
        # c-e: below the char floor
        + _turns("c-e", ["a", "b", "c"])
        # c-f: healthy, 5 turns
        + _turns("c-f", ["please check the table", "checking the table now",
                         "tool scan done fine", "the table looks healthy",
                         "great thanks so much"])
    )
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    ).repartition(4)
    out = curate_transcript_pairs(df).collect()
    return out


def test_dedup_and_gates(pairs):
    convs = {r["conv_id"] for r in pairs}
    assert convs == {"c-a", "c-f"}  # c-b deduped; c-c/c-d/c-e gated


def test_pair_shape(pairs):
    by_key = {(r["conv_id"], r["turn_idx"]): r for r in pairs}
    # c-f turn 1 (assistant): context is the single preceding user turn
    r = by_key[("c-f", 1)]
    assert r["context"] == "user: please check the table"
    assert r["target"] == "checking the table now"
    # c-f turn 4 (assistant): previous 3 turns, in order
    r4 = by_key[("c-f", 4)]
    assert r4["context"] == (
        "assistant: checking the table now\n"
        "tool: tool scan done fine\n"
        "user: the table looks healthy"
    )


def test_split_deterministic_per_conversation(spark, pairs):
    splits = {}
    for r in pairs:
        splits.setdefault(r["conv_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in splits.values())
