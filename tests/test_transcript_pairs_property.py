"""Property tests: the codegen pair-extraction lambda
(streaming/transcript_pairs.py) and the skew-aware join against
hypothesis-generated inputs — same single-machine-replay discipline as
tests/test_xor_core_property.py."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from xorfilter_net_spark.streaming.transcript_pairs import (
    pairs_from_turns_expr,
)

ROLES = ("user", "assistant", "tool")
WORDS = ("hi", "ok", "run", "x y", "", "tool done", "longer text here")


def _py_pairs(turns, k=3):
    """Single-machine replay of the batch ROWS-frame definition."""
    turns = sorted(turns)
    out = []
    for i, (idx, role, text) in enumerate(turns):
        if role != "assistant":
            continue
        ctx_rows = turns[max(0, i - k) : i]
        ctx = (
            "\n".join(f"{r}: {t}" for _, r, t in ctx_rows) if i > 0 else None
        )
        out.append((idx, ctx, text))
    return out


conversations = st.lists(
    st.tuples(st.sampled_from(ROLES), st.sampled_from(WORDS)),
    min_size=1,
    max_size=10,
)


@pytest.mark.usefixtures("spark")
@settings(max_examples=25, deadline=None)
@given(turns=conversations)
def test_pair_lambda_matches_python_replay(spark_session_holder, turns):
    spark = spark_session_holder[0]
    rows = [("c", i, r, t) for i, (r, t) in enumerate(turns)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    st_col = F.array_sort(
        F.collect_list(F.struct("turn_idx", "role", "text"))
    )
    got_rows = (
        df.groupBy("conv_id")
        .agg(st_col.alias("st"))
        .select(F.explode(pairs_from_turns_expr(3)).alias("p"))
        .select("p.turn_idx", "p.context", "p.target")
        .collect()
    )
    got = sorted((r["turn_idx"], r["context"], r["target"]) for r in got_rows)
    want = sorted(_py_pairs([(i, r, t) for i, (r, t) in enumerate(turns)]))
    assert got == want


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    # hypothesis forbids function-scoped fixtures inside @given; hand it
    # the session via a module-scoped holder instead
    return [spark]
