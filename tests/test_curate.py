"""End-to-end curation pipeline (pipeline/curate.py)."""

from pyspark.sql import functions as F

from xorfilter_net_spark.pipeline.curate import curate_corpus

# three DISTINCT stopword-rich English texts: shingle overlap between any
# two of them is zero, so decontamination only fires where intended
GOOD1 = (
    "the quick brown fox jumps over the lazy dog and then it runs back "
    "to the barn where all of his friends are waiting for him with some "
    "food and water because they have been there for a very long time now"
)
GOOD2 = (
    "once upon a time there was an old sailor who would tell anyone that "
    "listened about the storms he had seen and the ships he had sailed on "
    "during all those years out on the open sea far away from his home"
)
EVAL = (
    "in the middle of the night the little cat walked across the roof of "
    "the house and looked down at the quiet street below while the moon "
    "was shining bright above the sleeping town and nothing else moved"
)


def _corpus(spark):
    rows = [
        (1, GOOD1),
        (2, GOOD2),
        (3, GOOD1),  # exact dup of 1 -> dedup drops (min-id keeps 1)
        (4, "12345 67890 11 22 33"),  # low quality -> gate drops
        (5, EVAL),  # == eval text -> decontam drops
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    eval_df = spark.createDataFrame([(EVAL,)], "text string")
    return docs, eval_df


class TestCurateCorpus:
    def test_every_stage_applies(self, spark):
        docs, eval_df = _corpus(spark)
        out = curate_corpus(docs, eval_df, "doc_id", "text").collect()
        by_id = {r["doc_id"]: r for r in out}
        assert set(by_id) == {1, 2}  # 3 deduped, 4 gated, 5 decontaminated
        for r in out:
            assert r["quality_score"] >= 60
            assert r["lang_pred"] == "en"
            assert r["split"] in ("train", "val")

    def test_deterministic_across_runs_and_partitionings(self, spark):
        docs, eval_df = _corpus(spark)
        a = sorted(map(tuple, curate_corpus(docs, eval_df).collect()))
        b = sorted(
            map(tuple, curate_corpus(docs.repartition(7), eval_df).collect())
        )
        assert a == b

    def test_xor_pruned_decontam_identical(self, spark):
        docs, eval_df = _corpus(spark)
        base = sorted(map(tuple, curate_corpus(docs, eval_df).collect()))
        xor = sorted(
            map(tuple, curate_corpus(docs, eval_df, prune="xor").collect())
        )
        assert base == xor

    def test_empty_eval_set_keeps_all_clean_docs(self, spark):
        docs, _ = _corpus(spark)
        empty_eval = docs.filter("doc_id < 0").select("text")
        out = curate_corpus(docs, empty_eval).collect()
        assert {r["doc_id"] for r in out} == {1, 2, 5}

    def test_repetition_gate_optional(self, spark):
        docs, eval_df = _corpus(spark)
        spam = "the spam the spam " * 20 + "the end of it all"
        docs = docs.union(
            spark.createDataFrame([(6, spam)], "doc_id long, text string")
        )
        # gate off: the spammy doc passes quality (English, stopword-rich)
        base = {r["doc_id"] for r in curate_corpus(docs, eval_df).collect()}
        assert 6 in base
        # gate on: dominated by one repeated bigram -> dropped; others kept
        gated = {
            r["doc_id"]
            for r in curate_corpus(
                docs, eval_df, max_top_bigram_frac_e6=200000
            ).collect()
        }
        assert gated == base - {6}

    def test_lm_coverage_gate_optional(self, spark):
        _, eval_df = _corpus(spark)
        # near-variant of GOOD1: shares almost every bigram -> both
        # fluent docs have high coverage against the deduped corpus
        good1b = GOOD1.rsplit(" ", 3)[0] + " quite some time ago"
        # stopword-rich (passes the quality gate) but every CONTENT
        # bigram is unique corpus-wide -> coverage far below the others
        disfluent = (
            "the zq1x of the wv2k and the pl3m in the rr4t with the "
            "yu5b for the nn6c on the dd7e at the ff8g by the hh9j "
            "to the kk0l from the aa1z into the bb2y over the cc3x"
        )
        docs = spark.createDataFrame(
            [(1, GOOD1), (2, good1b), (7, disfluent)],
            "doc_id long, text string",
        )
        base = {r["doc_id"] for r in curate_corpus(docs, eval_df).collect()}
        assert base == {1, 2, 7}  # quality gate alone keeps all three
        gated = {
            r["doc_id"]
            for r in curate_corpus(
                docs, eval_df, min_bigram_coverage_e6=500000
            ).collect()
        }
        assert gated == {1, 2}
