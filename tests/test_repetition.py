"""Repetition quality signals (text/repetition.py)."""

from xorfilter_net_spark.text.repetition import repetition_signals


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = repetition_signals(df, "doc_id", "text").collect()
    return {r["doc_id"]: r.asDict() for r in out}


class TestRepetitionSignals:
    def test_hand_computed(self, spark):
        got = _run(spark, [(1, "a b a b\nx\nx")])
        r = got[1]
        # lines: ["a b a b", "x", "x"] -> 1 dup of 3; dup chars 2 of 9
        assert r["n_lines"] == 3
        assert r["dup_line_frac_e6"] == 333333
        assert r["dup_line_char_frac_e6"] == 222222
        # words: a b a b x x -> grams [a b, b a, a b, b x, x x]
        assert r["n_bigrams"] == 5
        assert r["top_bigram_count"] == 2
        assert r["top_bigram_frac_e6"] == 400000

    def test_no_repetition(self, spark):
        r = _run(spark, [(1, "one two three\nfour five")])[1]
        assert r["dup_line_frac_e6"] == 0
        assert r["dup_line_char_frac_e6"] == 0
        assert r["top_bigram_count"] == 1  # all bigrams distinct

    def test_single_word_and_empty(self, spark):
        got = _run(spark, [(1, "hello"), (2, "")])
        assert got[1]["n_lines"] == 1
        assert got[1]["dup_line_frac_e6"] == 0
        assert got[1]["n_bigrams"] == 0
        assert got[1]["top_bigram_count"] == 0
        assert got[1]["top_bigram_frac_e6"] is None  # 0/0 -> null
        assert got[2]["dup_line_char_frac_e6"] is None  # zero chars -> null

    def test_fully_duplicated_doc(self, spark):
        r = _run(spark, [(1, "spam spam\nspam spam\nspam spam")])[1]
        assert r["dup_line_frac_e6"] == 666666  # 2 of 3 lines are repeats
        assert r["dup_line_char_frac_e6"] == 1000000  # every char in a dup line
        # words: spam x6 -> 5 bigrams, all "spam spam"
        assert r["top_bigram_frac_e6"] == 1000000

    def test_partition_invariance(self, spark):
        rows = [(i, f"line {i % 3}\nline {i % 3}\nword {i}") for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = sorted(map(tuple, repetition_signals(df).collect()))
        b = sorted(map(tuple, repetition_signals(df.repartition(7)).collect()))
        assert a == b
