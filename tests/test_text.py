"""Text-analysis module: fingerprint kernel invariants + feature exprs.

Mirrors the reference's unit-test layering (SURVEY.md §5): kernel
determinism/edge cases first, then Spark integration on the tiny SF.
"""

import numpy as np
import pandas as pd
import pytest

from xorfilter_net_spark.text.analysis import (
    STOPWORDS,
    text_feature_exprs,
    with_text_features,
)
from xorfilter_net_spark.text.fingerprint import doc_fingerprints, gram_hashes


class TestFingerprintKernel:
    def test_identical_texts_identical_fp(self):
        fp = doc_fingerprints(pd.Series(["same doc text", "same doc text"]))
        assert fp[0] == fp[1]

    def test_distinct_texts_distinct_fp(self):
        fp = doc_fingerprints(pd.Series(["doc one here", "doc two here"]))
        assert fp[0] != fp[1]

    def test_order_sensitive(self):
        fp = doc_fingerprints(pd.Series(["ab cd", "cd ab"]))
        assert fp[0] != fp[1]

    def test_batch_invariance(self):
        """fp(text) must not depend on what else is in the Arrow batch —
        otherwise distributed and local runs would disagree."""
        solo = doc_fingerprints(pd.Series(["lonely document"]))[0]
        batched = doc_fingerprints(
            pd.Series(["padding a", "lonely document", "padding b", ""])
        )[1]
        assert solo == batched

    def test_empty_and_short_docs(self):
        fp = doc_fingerprints(pd.Series(["", "", "a", "b", "abc"]))
        assert fp[0] == fp[1]
        assert len({fp[0], fp[2], fp[3], fp[4]}) == 4

    def test_all_empty_batch_matches_mixed_batch(self):
        assert (
            doc_fingerprints(pd.Series(["", ""]))[0]
            == doc_fingerprints(pd.Series(["x", ""]))[1]
        )

    def test_none_treated_as_empty(self):
        fp = doc_fingerprints(pd.Series([None, ""]))
        assert fp[0] == fp[1]

    def test_gram_hashes_segments(self):
        h, doc_idx, offsets = gram_hashes(pd.Series(["abcdefghij", "xy"]), k=8)
        # doc0: 10-8+1=3 grams; doc1 short -> 1 padded gram
        assert list(np.bincount(doc_idx)) == [3, 1]

    def test_no_collisions_at_test_scale(self):
        texts = pd.Series([f"document number {i} content" for i in range(5000)])
        assert len(np.unique(doc_fingerprints(texts))) == 5000


class TestFeatureExprs:
    def test_dialects_cover_same_features(self):
        assert set(text_feature_exprs("spark")) == set(text_feature_exprs("duckdb"))

    @pytest.mark.parametrize("lang", list(STOPWORDS))
    def test_stopword_lists_lowercase(self, lang):
        assert all(w == w.lower() for w in STOPWORDS[lang])

    def test_features_on_crafted_rows(self, spark):
        df = spark.createDataFrame(
            [
                (0, "the cat and the dog, in a house. it is 42 for fun"),
                (1, ""),
                (2, "der hund und die katze ist im haus mit den"),
                (3, "12345"),
            ],
            "doc_id int, text string",
        )
        rows = {r["doc_id"]: r for r in with_text_features(df).collect()}
        r0 = rows[0]
        assert r0["lang_pred"] == "en"
        assert r0["token_count"] == 15  # 13 words + ',' + '.'
        assert r0["n_chars_calc"] == len(
            "the cat and the dog, in a house. it is 42 for fun"
        )
        assert 0 < r0["alpha_ratio_e6"] < 1_000_000
        assert 0 <= r0["quality_score"] <= 100
        r1 = rows[1]
        assert r1["token_count"] == 0
        assert r1["lang_pred"] == "und"
        assert r1["alpha_ratio_e6"] is None  # 0/0 guarded by nullif
        assert rows[2]["lang_pred"] == "de"
        assert rows[3]["digit_ratio_e6"] == 1_000_000

    def test_duckdb_oracle_agrees_on_crafted_rows(self):
        import duckdb

        con = duckdb.connect()
        con.execute(
            "create table documents as select * from (values "
            "(0, 'the cat and the dog, in a house. it is 42 for fun'), "
            "(1, ''), (2, 'el la de que y en los'), (3, 'le et les des en')"
            ") t(doc_id, text)"
        )
        exprs = text_feature_exprs("duckdb")
        cols = ", ".join(f"{sql} as {name}" for name, sql in exprs.items())
        out = con.execute(
            f"select doc_id, {cols} from documents order by doc_id"
        ).fetchdf()
        assert out.loc[0, "lang_pred"] == "en"
        assert out.loc[0, "token_count"] == 15
        assert out.loc[2, "lang_pred"] == "es"
        assert out.loc[3, "lang_pred"] == "fr"


def test_fingerprint_query_distinct_counts(spark, sf_tiny):
    from xorfilter_net_spark.entrypoints import QUERIES

    out = QUERIES["doc_fingerprint_distinct"](spark, sf_tiny).collect()
    assert len(out) > 0 and all(r["n_unique_fp"] > 0 for r in out)


# -- token-span UDTF ----------------------------------------------------------
def test_token_spans_offsets_substring_roundtrip(spark):
    from pyspark.sql import functions as F

    from xorfilter_net_spark.functions import token_spans

    rows = [
        (1, "Hello, world! 42x"),
        (2, ""),
        (3, None),
        (4, "  leading spaces\tand\nnewlines  "),
        (5, "unicode: héllo wörld ... 3.14"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = token_spans(spark, df, "text", "doc_id")
    # empty/null documents yield no rows (lateral join drops them)
    assert {r["doc_id"] for r in out.select("doc_id").distinct().collect()} == {1, 4, 5}
    # every span reproduces its token via SQL substring (1-based, len);
    # join text back on for the check
    joined = out.join(df, "doc_id")
    bad = joined.filter(
        F.expr("substring(text, start + 1, end - start) <> token")
    ).count()
    assert bad == 0
    # positions are dense 0..n-1 in document order
    for doc_id, spans in (
        (1, [(0, "Hello"), (1, ","), (2, "world"), (3, "!"), (4, "42"), (5, "x")]),
    ):
        got = [
            (r["pos"], r["token"])
            for r in out.filter(F.col("doc_id") == doc_id).orderBy("pos").collect()
        ]
        assert got == spans


class TestExtractFieldsUdtf:
    """Polymorphic UDTF: plan-time schema from the constant field list."""

    def test_schema_and_values(self, spark):
        from xorfilter_net_spark.functions.udtfs import (
            register_extract_fields_udtf,
        )

        register_extract_fields_udtf(spark)
        df = spark.createDataFrame(
            [
                (1, "path=/a/b,mode=rw,extra=zzz"),
                (2, "mode=ro"),
                (3, None),
            ],
            "id int, args string",
        )
        df.createOrReplaceTempView("_ef_logs")
        out = spark.sql(
            "select l.id, t.path, t.mode from _ef_logs l, "
            "lateral extract_fields(l.args, 'path,mode') t order by l.id"
        )
        assert [f.name for f in out.schema.fields] == ["id", "path", "mode"]
        rows = [tuple(r) for r in out.collect()]
        assert rows == [(1, "/a/b", "rw"), (2, None, "ro"), (3, None, None)]

    def test_different_field_list_different_schema(self, spark):
        from xorfilter_net_spark.functions.udtfs import (
            register_extract_fields_udtf,
        )

        register_extract_fields_udtf(spark)
        out = spark.sql(
            "select t.* from (select 'a=1,b=2,c=3' as s), "
            "lateral extract_fields(s, 'c,a') t"
        )
        assert [f.name for f in out.schema.fields] == ["c", "a"]
        assert [tuple(r) for r in out.collect()] == [("3", "1")]

    def test_non_constant_fields_fails_at_plan(self, spark):
        import pytest
        from pyspark.errors import AnalysisException

        from xorfilter_net_spark.functions.udtfs import (
            register_extract_fields_udtf,
        )

        register_extract_fields_udtf(spark)
        with pytest.raises(AnalysisException):
            spark.sql(
                "select t.* from (select 'a=1' as s, 'a' as f), "
                "lateral extract_fields(s, f) t"
            ).collect()


class TestRedaction:
    """text/redact.py — engine-portable PII scrubbing (map-only codegen)."""

    SAMPLE = (
        "mail bob.smith+x@corp.example.org link https://a.io/p?q=1 "
        "ip 192.168.0.1 card 4111111111111111 tel 555-867-5309 "
        "key 0123456789abcdef0123456789abcdef done"
    )

    def _spark_redact(self, spark, texts):
        from xorfilter_net_spark.text.redact import redact_text

        df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                   "id long, text string")
        return redact_text(df, "text").orderBy("id").collect()

    def test_all_rules_fire_and_counts(self, spark):
        [r] = self._spark_redact(spark, [self.SAMPLE])
        assert r["redacted"] == (
            "mail <EMAIL> link <URL> ip <IP> card <CARD> tel <PHONE> "
            "key <KEY> done"
        )
        for rule in ("email", "url", "ipv4", "card", "phone", "hexkey"):
            assert r[f"n_{rule}"] == 1, rule

    def test_clean_text_untouched(self, spark):
        [r] = self._spark_redact(spark, ["just plain words here"])
        assert r["redacted"] == "just plain words here"
        assert all(
            r[f"n_{n}"] == 0
            for n in ("email", "url", "ipv4", "card", "phone", "hexkey")
        )

    def test_rule_order_url_consumes_embedded_ip(self, spark):
        [r] = self._spark_redact(spark, ["see http://10.0.0.1/admin now"])
        assert r["redacted"] == "see <URL> now"
        # counts are measured on the ORIGINAL text: both patterns matched
        assert r["n_url"] == 1 and r["n_ipv4"] == 1

    def test_duckdb_parity_bit_exact(self, spark):
        import duckdb

        from xorfilter_net_spark.text.redact import redact_exprs

        texts = [
            self.SAMPLE,
            "just plain words",
            "two mails a@b.co c@d.org and 10.1.2.3 4111111111111111",
            "http://u:p@host/x then e@f.gg",
            "",
        ]
        got = self._spark_redact(spark, texts)
        exprs = redact_exprs("duckdb", "text")
        cols = ", ".join(f"{sql} as {name}" for name, sql in exprs.items())
        con = duckdb.connect()
        con.execute("create table t(id bigint, text varchar)")
        con.executemany("insert into t values (?, ?)",
                        [(i, t) for i, t in enumerate(texts)])
        want = con.execute(f"select {cols} from t order by id").df()
        for i, row in enumerate(got):
            assert row["redacted"] == want["redacted"][i], texts[i]
            for n in ("email", "url", "ipv4", "card", "phone", "hexkey"):
                assert row[f"n_{n}"] == want[f"n_{n}"][i], (texts[i], n)


class TestTokenCooccurrence:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        rows = [
            (1, "a b c"),
            (2, "a b"),
            (3, "b c d"),
            (4, "a a b"),  # within-doc dup: counts once
            (5, "e"),
        ]
        return spark.createDataFrame(rows, "doc_id int, text string")

    def test_exact_pair_counts(self, docs):
        from xorfilter_net_spark.text.cooccur import token_cooccurrence

        got = {
            (r["tok_a"], r["tok_b"]): (r["pair_docs"], r["df_a"], r["df_b"])
            for r in token_cooccurrence(docs, "doc_id", "text").collect()
        }
        assert got[("a", "b")] == (3, 3, 4)  # docs 1,2,4
        assert got[("b", "c")] == (2, 4, 2)  # docs 1,3
        assert got[("a", "c")] == (1, 3, 2)  # doc 1
        assert got[("c", "d")] == (1, 2, 1)  # doc 3
        assert ("e", "e") not in got and not any(
            a >= b for a, b in got
        )  # strict ordering, no self pairs

    def test_pair_docs_bounded_by_marginals(self, docs):
        from xorfilter_net_spark.text.cooccur import token_cooccurrence

        for r in token_cooccurrence(docs, "doc_id", "text").collect():
            assert r["pair_docs"] <= min(r["df_a"], r["df_b"])

    def test_top_v_cap_is_deterministic(self, docs):
        from xorfilter_net_spark.text.cooccur import token_cooccurrence

        # df: b=4, a=3, c=2, d=1, e=1 -> top-2 = {b, a}
        rows = token_cooccurrence(docs, "doc_id", "text", top_v=2).collect()
        assert {(r["tok_a"], r["tok_b"]) for r in rows} == {("a", "b")}

    def test_vocab_prune_is_broadcast(self, docs):
        from xorfilter_net_spark.text.cooccur import token_cooccurrence

        plan = token_cooccurrence(
            docs, "doc_id", "text", top_v=2
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


class TestContamination:
    def test_partial_and_full_overlap(self, spark):
        from pyspark.sql import functions as F

        from xorfilter_net_spark.text.contamination import contamination_report

        shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
        rows = [
            (0, shared),  # exact eval copy -> 100% contaminated
            (1, "one two three four five six seven eight nine ten"),  # clean
            # first 8 tokens shared (4 of its 9 shingles), then distinct
            (2, shared + " iota kappa lam mu nu"),
            (3, "tiny doc"),  # < 5 tokens -> excluded from the report
        ]
        train = spark.createDataFrame(rows, "doc_id long, text string")
        ev = spark.createDataFrame([(shared,)], "text string")
        rep = contamination_report(train, ev, "doc_id", "text", n=5,
                                   threshold_pct=50).toPandas()
        rep = rep.set_index("doc_id")
        assert set(rep.index) == {0, 1, 2}
        assert rep.loc[0, "n_matched"] == rep.loc[0, "n_shingles"] == 4
        assert bool(rep.loc[0, "contaminated"])
        assert rep.loc[1, "n_matched"] == 0 and not rep.loc[1, "contaminated"]
        # doc 2: 13 tokens -> 9 shingles, the 4 eval shingles match
        assert rep.loc[2, "n_shingles"] == 9
        assert rep.loc[2, "n_matched"] == 4
        assert not bool(rep.loc[2, "contaminated"])  # 4*100 < 50*9
        # at a 40% threshold doc 2 flips
        rep40 = (
            contamination_report(train, ev, "doc_id", "text", n=5,
                                 threshold_pct=40)
            .filter(F.col("doc_id") == 2).toPandas()
        )
        assert bool(rep40["contaminated"].iloc[0])  # 4*100 >= 40*9

    def test_shingles_guard_short_docs(self, spark):
        from xorfilter_net_spark.text.contamination import shingles_col

        df = spark.createDataFrame(
            [("a b c d",), ("a b c d e",), ("a b c d e f",)], "text string"
        )
        out = df.select(shingles_col("text", 5).alias("sh")).collect()
        assert [len(r["sh"]) for r in out] == [0, 1, 2]


class TestTfidfTopk:
    @pytest.fixture()
    def docs(self, spark):
        rows = [
            (1, "apple banana apple cherry"),
            (2, "banana cherry cherry"),
            (3, "apple durian"),
            (4, "banana banana banana"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_exact_scores_and_tiebreak(self, docs):
        from xorfilter_net_spark.text.tfidf import tfidf_topk

        out = {
            (r["doc_id"], r["rnk"]): (r["tok"], r["tf"], r["df"])
            for r in tfidf_topk(docs, "doc_id", "text", k=2).collect()
        }
        # df: apple=2, banana=3, cherry=2, durian=1
        # doc1: apple 2/2=1.0 > cherry 1/2=0.5 > banana 1/3
        assert out[(1, 1)] == ("apple", 2, 2)
        assert out[(1, 2)] == ("cherry", 1, 2)
        # doc2: cherry 2/2=1.0 > banana 1/3
        assert out[(2, 1)] == ("cherry", 2, 2)
        assert out[(2, 2)] == ("banana", 1, 3)
        # doc3: durian 1/1=1.0 > apple 1/2 (tie impossible; ratio decides)
        assert out[(3, 1)] == ("durian", 1, 1)
        assert out[(3, 2)] == ("apple", 1, 2)
        # doc4: single distinct term
        assert out[(4, 1)] == ("banana", 3, 3)
        assert (4, 2) not in out

    def test_k_bounds_rows_per_doc(self, docs):
        from xorfilter_net_spark.text.tfidf import tfidf_topk

        rows = tfidf_topk(docs, "doc_id", "text", k=1).collect()
        assert len(rows) == 4 and all(r["rnk"] == 1 for r in rows)

    def test_topk_plan_has_partial_window_group_limit(self, docs):
        from xorfilter_net_spark.text.tfidf import tfidf_topk

        plan = (
            tfidf_topk(docs, "doc_id", "text", k=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the pre-exchange prune: at most k rows per (doc, map task) shuffle
        assert "WindowGroupLimit" in plan
