"""r04 operators: conversation lint, context-budget truncation,
C4 line cleaning, substring search — unit semantics on hand-built
fixtures, then spot properties (zero false negatives, suffix
maximality) the registered-query oracles can't isolate."""

from __future__ import annotations

from pyspark.sql import functions as F

from xorfilter_net_spark.pipeline.conv_lint import conversation_lint
from xorfilter_net_spark.text.budget import truncate_to_context_budget
from xorfilter_net_spark.text.c4_clean import c4_line_clean
from xorfilter_net_spark.text.index import substring_search

TURN_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts_epoch long"
)


# ------------------------------------------------------------------ lint
def _lint_row(df, conv):
    rows = {r["conv_id"]: r for r in df.collect()}
    return rows[conv]


def test_lint_clean_conversation(spark):
    rows = [
        ("c1", 0, "user", "hi", None, 100),
        ("c1", 1, "assistant", "hello", None, 101),
        ("c1", 2, "tool", "result", "tool_a", 102),
    ]
    rep = conversation_lint(spark.createDataFrame(rows, TURN_SCHEMA))
    r = _lint_row(rep, "c1")
    assert r["is_clean"] and r["idx_contiguous"]
    assert r["n_ts_violations"] == 0 and r["n_role_mismatch"] == 0
    assert r["n_empty_turns"] == 0 and r["n_tool_dangling"] == 0


def test_lint_flags_every_defect_kind(spark):
    rows = [
        # ts goes backwards at turn 1; empty text at turn 2
        ("c2", 0, "user", "a", None, 100),
        ("c2", 1, "assistant", "b", None, 90),
        ("c2", 2, "tool", "", "tool_a", 105),
        # index gap (no turn 1), wrong role at 0, dangling tool at 0
        ("c3", 0, "assistant", "x", "tool_b", 100),
        ("c3", 2, "tool", "y", "tool_b", 101),
        # tool-role turn MISSING its tool field
        ("c4", 0, "user", "q", None, 100),
        ("c4", 1, "assistant", "r", None, 101),
        ("c4", 2, "tool", "s", None, 102),
    ]
    rep = conversation_lint(spark.createDataFrame(rows, TURN_SCHEMA))
    r2 = _lint_row(rep, "c2")
    assert r2["n_ts_violations"] == 1 and r2["n_empty_turns"] == 1
    assert r2["idx_contiguous"] and not r2["is_clean"]
    r3 = _lint_row(rep, "c3")
    assert not r3["idx_contiguous"]
    assert r3["n_role_mismatch"] == 1  # 'assistant' at idx 0
    assert r3["n_tool_dangling"] == 1  # tool set on the assistant turn
    r4 = _lint_row(rep, "c4")
    assert r4["n_tool_dangling"] == 1 and not r4["is_clean"]


# ---------------------------------------------------------------- budget
def test_budget_keeps_longest_suffix(spark):
    rows = [
        ("c1", 0, "user", "one two three four five", None, 1),
        ("c1", 1, "assistant", "a b c", None, 2),
        ("c1", 2, "user", "x y", None, 3),
    ]
    df = spark.createDataFrame(rows, TURN_SCHEMA)
    kept = truncate_to_context_budget(df, 6).collect()
    # suffix sums: turn2=2, turn1+2=5, turn0..2=10 -> keep turns 1,2
    assert sorted(r["turn_idx"] for r in kept) == [1, 2]
    by_idx = {r["turn_idx"]: r for r in kept}
    assert by_idx[2]["cum_tokens"] == 2 and by_idx[1]["cum_tokens"] == 5
    # an over-budget single turn drops everything from there back
    kept1 = truncate_to_context_budget(df, 1).collect()
    assert kept1 == []


def test_budget_empty_text_counts_zero(spark):
    rows = [("c1", 0, "user", "", None, 1), ("c1", 1, "tool", None, "t", 2)]
    df = spark.createDataFrame(rows, TURN_SCHEMA)
    kept = truncate_to_context_budget(df, 0).collect()
    assert sorted(r["turn_idx"] for r in kept) == [0, 1]
    assert all(r["n_tokens"] == 0 for r in kept)


# -------------------------------------------------------------- c4 clean
def test_c4_rules(spark):
    docs = [
        (1, "Good first sentence here.\nshort.\nno terminal punct"),
        (2, "Please enable javascript now.\nAnother fine sentence stays."),
        (3, "This one mentions a brace { inline.\nKept line otherwise."),
        (4, "Normal text line kept here.\nLorem Ipsum dolor sit amet."),
        (5, "no keepable lines at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in c4_line_clean(df).collect()}
    r1 = out[1]
    assert r1["n_lines"] == 3 and r1["n_kept"] == 1
    assert r1["n_short"] == 1 and r1["n_no_terminal"] == 1
    assert r1["keep_doc"] and r1["cleaned_text"] == "Good first sentence here."
    r2 = out[2]
    assert r2["n_javascript"] == 1 and r2["n_kept"] == 1 and r2["keep_doc"]
    r3 = out[3]
    assert r3["has_brace"] and not r3["keep_doc"]
    assert r3["cleaned_text"] is None
    r4 = out[4]
    assert r4["has_lorem"] and not r4["keep_doc"]
    r5 = out[5]
    assert r5["n_kept"] == 0 and not r5["keep_doc"]


def test_c4_null_text(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = c4_line_clean(df).collect()[0]
    assert not r["keep_doc"] and r["n_kept"] == 0
    assert r["has_brace"] is False and r["has_lorem"] is False


# ------------------------------------------------------------- substring
def test_substring_search_exact_vs_bruteforce(spark):
    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "quick brown foxes are not lazy"),
        (4, "completely unrelated content"),
    ]
    queries = [(10, "quick brown"), (11, "lazy"), (12, "zz-absent-zz")]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(queries, "query_id long, q string")
    got = {
        (r["query_id"], r["doc_id"])
        for r in substring_search(ddf, qdf, gram_len=4).collect()
    }
    expect = {
        (qid, did)
        for did, t in docs
        for qid, q in queries
        if q in t
    }
    assert got == expect
    assert (10, 1) in got and (10, 3) in got and (11, 1) in got
    assert not any(qid == 12 for qid, _ in got)


def test_substring_search_gram_boundary(spark):
    # needle exactly gram_len chars and straddling doc gram boundaries
    ddf = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "xxabcdxx")], "doc_id long, text string"
    )
    qdf = spark.createDataFrame([(1, "abcd")], "query_id long, q string")
    got = {
        (r["query_id"], r["doc_id"])
        for r in substring_search(ddf, qdf, gram_len=4).collect()
    }
    assert got == {(1, 1), (1, 2)}


# ----------------------------------------------------------- turn merge
def test_merge_consecutive_turns(spark):
    from xorfilter_net_spark.pipeline.turn_merge import (
        merge_consecutive_turns,
    )

    rows = [
        ("c1", 0, "user", "hello", None, 1),
        ("c1", 1, "user", "are you there?", None, 2),
        ("c1", 2, "assistant", "yes", None, 3),
        ("c1", 3, "assistant", "how can I help?", None, 4),
        ("c1", 4, "user", "thanks", None, 5),
        ("c2", 0, "user", "solo", None, 1),
    ]
    out = merge_consecutive_turns(spark.createDataFrame(rows, TURN_SCHEMA))
    got = {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["n_merged"])
        for r in out.collect()
    }
    assert got[("c1", 0)] == ("user", "hello\nare you there?", 2)
    assert got[("c1", 1)] == ("assistant", "yes\nhow can I help?", 2)
    assert got[("c1", 2)] == ("user", "thanks", 1)
    assert got[("c2", 0)] == ("user", "solo", 1)
    # strict alternation restored
    assert len(got) == 4


def test_merge_turns_null_text_and_gaps(spark):
    from xorfilter_net_spark.pipeline.turn_merge import (
        merge_consecutive_turns,
    )

    rows = [
        # non-contiguous turn_idx (5, 9) still ordered correctly
        ("c1", 5, "tool", None, "t", 1),
        ("c1", 9, "tool", "out", "t", 2),
    ]
    out = merge_consecutive_turns(
        spark.createDataFrame(rows, TURN_SCHEMA)
    ).collect()
    assert len(out) == 1
    assert out[0]["text"] == "\nout" and out[0]["n_merged"] == 2


# --------------------------------------------------------- decayed top-k
def test_decayed_topk_halving_weights(spark):
    import datetime as dt

    from xorfilter_net_spark.sketches.decay import decayed_topk_mg

    def t(day):
        return dt.datetime(2024, 1, day)

    rows = (
        # 'old' dominates raw counts but is 2 periods stale:
        # score = 8 * 2^0 = 8 (base = day 1 within window 3)
        [("old", t(1))] * 8
        # 'hot' is recent: score = 3 * 2^2 = 12
        + [("hot", t(3))] * 3
        # 'mid': 2 * 2^1 = 4
        + [("mid", t(2))] * 2
    )
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = {
        r["key"]: (r["decayed_score"], r["n_periods"])
        for r in decayed_topk_mg(
            df, "k", "ts", k=16, window=3, top=None
        ).collect()
    }
    assert got == {"hot": (12, 1), "old": (8, 1), "mid": (4, 1)}


def test_decayed_topk_window_excludes_stale(spark):
    import datetime as dt

    from xorfilter_net_spark.sketches.decay import decayed_topk_mg

    rows = [("stale", dt.datetime(2024, 1, 1))] * 100 + [
        ("live", dt.datetime(2024, 1, 20))
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = decayed_topk_mg(df, "k", "ts", k=16, window=3, top=None).collect()
    assert [r["key"] for r in got] == ["live"]


def test_decayed_topk_validation_and_empty(spark):
    import pytest as _pytest

    from xorfilter_net_spark.sketches.decay import decayed_topk_mg

    df = spark.createDataFrame([], "k string, ts timestamp")
    assert decayed_topk_mg(df, "k", "ts", window=3).collect() == []
    with _pytest.raises(ValueError):
        decayed_topk_mg(df, "k", "ts", window=0)
    with _pytest.raises(ValueError):
        decayed_topk_mg(df, "k", "ts", window=63)


# ------------------------------------------------------ rolling quantile
def test_rolling_quantile_kll_exact_below_k(spark):
    import datetime as dt

    from xorfilter_net_spark.sketches.rolling import rolling_quantile_kll

    rows = [
        (float(v), dt.datetime(2024, 1, 1)) for v in range(1, 11)
    ] + [(float(v), dt.datetime(2024, 1, 2)) for v in range(11, 21)]
    df = spark.createDataFrame(rows, "value double, ts timestamp")
    got = {
        (r["period"], r["q_e6"]): r["est_value"]
        for r in rolling_quantile_kll(
            df, "value", "ts", qs=(0.5,), k=200, window=7
        ).collect()
    }
    assert len(got) == 2  # one row per active period
    periods = sorted(p for p, _ in got)
    # day-1 window sees 1..10; day-2 window sees 1..20; below k the
    # sketch is exact, so the estimate is an actual item near the median
    assert 5.0 <= got[(periods[0], 500000)] <= 6.0
    assert 10.0 <= got[(periods[1], 500000)] <= 11.0


def test_rolling_quantile_validation(spark):
    import pytest as _pytest

    from xorfilter_net_spark.sketches.rolling import rolling_quantile_kll

    df = spark.createDataFrame([], "value double, ts timestamp")
    with _pytest.raises(ValueError):
        rolling_quantile_kll(df, "value", "ts", window=0)


def test_lint_null_role_flags(spark):
    rows = [
        ("c5", 0, None, "x", None, 100),
        ("c5", 1, "assistant", "y", "t", 101),
    ]
    rep = conversation_lint(spark.createDataFrame(rows, TURN_SCHEMA))
    r = _lint_row(rep, "c5")
    assert r["n_role_mismatch"] == 1  # null role IS a cycle violation
    assert r["n_tool_dangling"] == 1  # tool set on the assistant turn
    assert not r["is_clean"]


# ------------------------------------------------------------- reconcile
def test_reconcile_identical_and_diverged(spark):
    from xorfilter_net_spark.relational.reconcile import reconcile_tables

    a = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "id long, v string"
    )
    same = reconcile_tables(a, a, ["id", "v"], "id", 8).collect()
    assert all(r["rows_match"] for r in same)
    assert sum(r["n_a"] for r in same) == 3

    b = spark.createDataFrame(
        [(1, "x"), (2, "CHANGED"), (4, "new")], "id long, v string"
    )
    diff = reconcile_tables(a, b, ["id", "v"], "id", 8).collect()
    bad = [r for r in diff if not r["rows_match"]]
    # rows 2 (changed), 3 (only in a), 4 (only in b) damage <= 3 buckets
    assert 1 <= len(bad) <= 3
    assert sum(r["n_a"] for r in diff) == 3
    assert sum(r["n_b"] for r in diff) == 3


def test_reconcile_order_and_partitioning_invariant(spark):
    from xorfilter_net_spark.relational.reconcile import bucket_digests

    a = spark.createDataFrame(
        [(i, f"v{i}") for i in range(50)], "id long, v string"
    )
    d1 = sorted(tuple(r) for r in bucket_digests(a, ["id", "v"], "id").collect())
    shuffled = a.orderBy("v").repartition(7)
    d2 = sorted(
        tuple(r) for r in bucket_digests(shuffled, ["id", "v"], "id").collect()
    )
    assert d1 == d2


# ------------------------------------------------- review-pass regressions
def test_merge_turns_null_role_boundaries(spark):
    from xorfilter_net_spark.pipeline.turn_merge import (
        merge_consecutive_turns,
    )

    rows = [
        ("c1", 0, "user", "a", None, 1),
        ("c1", 1, None, "b", None, 2),  # NULL role = its own run
        ("c1", 2, None, "c", None, 3),  # ...that NULL joins
        ("c1", 3, "user", "d", None, 4),
    ]
    out = sorted(
        (r["turn_idx"], r["role"], r["text"], r["n_merged"])
        for r in merge_consecutive_turns(
            spark.createDataFrame(rows, TURN_SCHEMA)
        ).collect()
    )
    assert out == [
        (0, "user", "a", 1),
        (1, None, "b\nc", 2),
        (2, "user", "d", 1),
    ]


def test_reconcile_null_keys_match_themselves(spark):
    from xorfilter_net_spark.relational.reconcile import reconcile_tables

    a = spark.createDataFrame(
        [(None, "x"), (1, "y")], "id long, v string"
    )
    rep = reconcile_tables(a, a, ["id", "v"], "id", 8).collect()
    assert all(r["rows_match"] for r in rep)
    assert all(r["bucket"] is not None for r in rep)
    assert sum(r["n_a"] for r in rep) == 2


def test_lint_negative_turn_idx_flags_not_crashes(spark):
    rows = [
        ("c9", -1, "user", "x", None, 100),
        ("c9", 0, "user", "y", None, 101),
    ]
    rep = conversation_lint(spark.createDataFrame(rows, TURN_SCHEMA))
    r = _lint_row(rep, "c9")
    # pmod(-1, 3) = 2 -> expected 'tool' -> mismatch, and the index set
    # {-1, 0} is not {0, 1} -> not contiguous; no element_at crash
    assert not r["idx_contiguous"] and r["n_role_mismatch"] >= 1


def test_decayed_topk_overflow_raises(spark):
    import datetime as dt

    import pytest as _pytest

    from xorfilter_net_spark.sketches.decay import decayed_topk_mg

    # the NEWEST period carries weight 2^(window-1): 8 rows there at
    # window 62 give 8 x 2^61 > int64 (the old row anchors the base)
    rows = [("k", dt.datetime(2024, 1, 1))] + [
        ("k", dt.datetime(2024, 3, 2))
    ] * 8  # Mar 2 - Jan 1 = 61 days
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    with _pytest.raises(Exception, match="exceeds int64"):
        decayed_topk_mg(df, "k", "ts", k=16, window=62, top=None).collect()


# ------------------------------------------------- r05 ADVICE regressions
def test_lint_duplicate_turn_idx_deterministic(spark):
    """Duplicate turn_idx (a defect class the lint targets): with the
    (idx, ts) tiebreak the ts-violation count is a pure function of
    the data, identical across run orders / partitionings."""
    rows = [
        ("c10", 0, "user", "a", None, 100),
        ("c10", 1, "assistant", "b", None, 90),  # dup idx, later ts
        ("c10", 1, "assistant", "c", None, 80),  # dup idx, earlier ts
        ("c10", 2, "tool", "d", "t", 95),
    ]
    want = None
    for seed in range(4):
        df = spark.createDataFrame(rows, TURN_SCHEMA).repartition(seed + 1)
        r = _lint_row(conversation_lint(df), "c10")
        got = (r["n_ts_violations"], r["idx_contiguous"])
        if want is None:
            want = got
        assert got == want
    # tie group sorted by ts ascending -> effective order
    # (100, 80, 90, 95): the only decrease is 80 < 100 -> exactly 1
    assert want == (1, False)


def test_lint_null_turn_idx_is_role_violation(spark):
    """NULL turn_idx has no expected cycle position: flagged as a role
    violation by definition (Spark and the SQL oracle agree), even for
    a 'tool' role that the oracle's CASE-ELSE branch used to excuse."""
    rows = [
        ("c11", None, "tool", "x", "t", 100),
        ("c11", 0, "user", "y", None, 101),
    ]
    rep = conversation_lint(spark.createDataFrame(rows, TURN_SCHEMA))
    r = _lint_row(rep, "c11")
    assert r["n_role_mismatch"] == 1 and not r["idx_contiguous"]


def test_merge_turns_duplicate_turn_idx_deterministic(spark):
    """Duplicate turn_idx: the (idx, role, text) tiebreak makes run ids
    and joined text a pure function of the data."""
    from xorfilter_net_spark.pipeline.turn_merge import (
        merge_consecutive_turns,
    )

    rows = [
        ("c1", 0, "user", "a", None, 100),
        ("c1", 1, "user", "z", None, 101),  # dup idx, text sorts after
        ("c1", 1, "user", "b", None, 102),
        ("c1", 2, "assistant", "c", None, 103),
    ]
    want = None
    for seed in range(4):
        df = spark.createDataFrame(rows, TURN_SCHEMA).repartition(seed + 1)
        got = sorted(
            (r["turn_idx"], r["role"], r["text"], r["n_merged"])
            for r in merge_consecutive_turns(df).collect()
        )
        if want is None:
            want = got
        assert got == want
    assert want == [(0, "user", "a\nb\nz", 3), (1, "assistant", "c", 1)]


def test_reconcile_no_separator_aliasing(spark):
    """Rows differing only in separator placement or NULL-vs-sentinel
    must NOT digest identically (fields are md5'd before joining, so
    the encoding is prefix-free)."""
    from xorfilter_net_spark.relational.reconcile import reconcile_tables

    a = spark.createDataFrame([("a\x1fb", "c")], "x string, y string")
    b = spark.createDataFrame([("a", "b\x1fc")], "x string, y string")
    rep = reconcile_tables(a, b, ["x", "y"], "x", 4).collect()
    assert any(not r["rows_match"] for r in rep)

    c = spark.createDataFrame([(None, "v")], "x string, y string")
    d = spark.createDataFrame([("\x00", "v")], "x string, y string")
    rep2 = reconcile_tables(c, d, ["x", "y"], "x", 4).collect()
    assert any(not r["digest_match"] for r in rep2)
