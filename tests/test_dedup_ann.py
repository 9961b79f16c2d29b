"""Dedup family (exact / MinHash+LSH / SimHash) and ANN (brute + LSH)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xorfilter_net_spark.ann.brute import cosine_e6, quantize, topk_cosine
from xorfilter_net_spark.ann.lsh import hyperplanes, lsh_topk_cosine
from xorfilter_net_spark.dedup.exact import duplicate_stats, exact_dedup
from xorfilter_net_spark.dedup.minhash import (
    lsh_candidate_pairs,
    minhash_batch,
    minhash_signatures,
    near_duplicate_pairs,
)
from xorfilter_net_spark.dedup.simhash import simhash_batch, simhash_near_pairs

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm sunny windowsill nearby every single afternoon "
)


class TestMinHashKernel:
    def test_identical_sigs(self):
        s = minhash_batch(pd.Series([BASE, BASE]))
        assert (s[0] == s[1]).all()

    def test_signature_estimates_jaccard(self):
        """Broder: P[slot match] = J. Truncating 20% of chars keeps
        J ~= 0.8; the 128-perm estimate should land within ~4 sigma
        (sigma = sqrt(J(1-J)/128) ~= 0.035)."""
        trunc = BASE[: int(len(BASE) * 0.8)]
        s = minhash_batch(pd.Series([BASE, trunc]))
        est = (s[0] == s[1]).mean()

        def shingles(t):
            return {t[i : i + 8] for i in range(len(t) - 7)}

        a, b = shingles(BASE), shingles(trunc)
        true_j = len(a & b) / len(a | b)
        assert abs(est - true_j) < 0.15

    def test_batch_invariance(self):
        solo = minhash_batch(pd.Series([BASE]))[0]
        batched = minhash_batch(pd.Series(["other doc", BASE, ""]))[1]
        assert (solo == batched).all()


class TestSimHashKernel:
    def test_identity_and_sensitivity(self):
        s = simhash_batch(
            pd.Series([BASE, BASE, BASE[:-10], "entirely unrelated content"])
        ).view(np.uint64)

        def ham(a, b):
            return bin(int(a ^ b)).count("1")

        assert ham(s[0], s[1]) == 0
        assert ham(s[0], s[2]) <= 10
        assert ham(s[0], s[3]) >= 15


class TestExactDedup:
    def test_survivors_and_stats(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "a"), (4, "a"), (5, "c")],
            "id int, text string",
        )
        out = exact_dedup(df, "id", ["text"])
        assert sorted(r["id"] for r in out.collect()) == [1, 2, 5]
        st = duplicate_stats(df, ["text"]).collect()[0]
        assert (st["n_rows"], st["n_distinct"], st["n_dup_rows"]) == (5, 3, 2)


class TestMinHashLshSpark:
    def test_near_dup_pipeline(self, spark):
        rows = [(i, f"{BASE} unique tail {i} " + "pad " * i) for i in range(20)]
        # two injected near-dups of doc 3 (truncate / tiny suffix change)
        base3 = rows[3][1]
        rows.append((100, base3[: int(len(base3) * 0.92)]))
        rows.append((101, base3 + " x"))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = near_duplicate_pairs(df, "doc_id", "text", tau=0.5).collect()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (3, 100) in got and (3, 101) in got
        for r in pairs:
            assert r["jaccard_e6"] >= 500000

    def test_lsh_bucket_cap_drops_degenerate_buckets(self, spark):
        df = spark.createDataFrame(
            [(i, "identical text everywhere") for i in range(10)],
            "doc_id long, text string",
        )
        sigs = minhash_signatures(df, "doc_id", "text")
        assert lsh_candidate_pairs(sigs, max_bucket_size=5).count() == 0
        assert lsh_candidate_pairs(sigs, max_bucket_size=100).count() == 45

    def test_simhash_near_pairs(self, spark):
        rows = [(i, f"{BASE} distinct tail marker {i} " + "filler %d " % i * 20) for i in range(8)]
        rows.append((50, rows[0][1] + " y"))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["id_a"], r["id_b"])
            for r in simhash_near_pairs(df, "doc_id", "text", max_distance=6).collect()
        }
        assert (0, 50) in got


class TestAnn:
    def test_quantized_cosine_exact(self):
        a = np.array([[0.5, 0.25, -0.125]])
        q = quantize(a)
        assert q.tolist() == [[500, 250, -125]]
        c = cosine_e6(
            (q * q).sum(axis=1), (q * q).sum(axis=1), (q * q).sum(axis=1)
        )
        assert c[0] in (999999, 1000000)  # self-cosine up to floor rounding

    def test_hyperplanes_deterministic(self):
        assert (hyperplanes(16, 32, 7) == hyperplanes(16, 32, 7)).all()
        assert not (hyperplanes(16, 32, 7) == hyperplanes(16, 32, 8)).all()

    def test_brute_topk_matches_numpy(self, spark, sf_tiny):
        emb = spark.read.parquet(f"{sf_tiny}/embeddings.parquet")
        pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
        queries = [
            (int(r.vec_id), list(r.embedding))
            for r in pdf.itertuples()
            if r.vec_id % 25 == 0
        ]
        out = topk_cosine(emb, "vec_id", "embedding", queries, k=5).collect()
        E = quantize(np.stack(pdf.embedding.to_numpy()))
        ids = pdf.vec_id.to_numpy()
        norms = (E * E).sum(axis=1)
        for qid, qvec in queries[:3]:
            qi = np.flatnonzero(ids == qid)[0]
            scores = cosine_e6(E @ E[qi], norms, np.array([norms[qi]]))
            mask = ids != qid
            order = np.lexsort((ids[mask], -scores[mask]))[:5]
            expect = list(zip(ids[mask][order], scores[mask][order]))
            got = sorted(
                [(r["neighbor_id"], r["cos_e6"]) for r in out if r["qid"] == qid],
                key=lambda t: (-t[1], t[0]),
            )
            assert got == [(int(i), int(s)) for i, s in expect]

    def test_lsh_topk_recall(self, spark, sf_tiny):
        emb = spark.read.parquet(f"{sf_tiny}/embeddings.parquet")
        queries = [
            (r["vec_id"], list(r["embedding"]))
            for r in emb.filter("vec_id % 25 = 0").collect()
        ]
        exact = topk_cosine(emb, "vec_id", "embedding", queries, k=10)
        approx = lsh_topk_cosine(emb, "vec_id", "embedding", queries, k=10)
        hits = exact.join(approx, ["qid", "neighbor_id"], "left_semi").count()
        assert hits / exact.count() > 0.3  # loose at tiny SF
        # rerank is exact: every returned score equals the brute score
        both = exact.selectExpr("qid", "neighbor_id", "cos_e6 as c1").join(
            approx.selectExpr("qid", "neighbor_id", "cos_e6 as c2"),
            ["qid", "neighbor_id"],
        )
        assert both.filter("c1 <> c2").count() == 0


class TestIvf:
    def _queries(self, emb):
        return [
            (r["vec_id"], list(r["embedding"]))
            for r in emb.filter("vec_id % 25 = 0").collect()
        ]

    def test_centroids_deterministic_unit_norm(self, spark, sf_tiny):
        from xorfilter_net_spark.ann.ivf import train_centroids

        emb = spark.read.parquet(f"{sf_tiny}/embeddings.parquet")
        a = train_centroids(emb, "vec_id", "embedding", n_cells=16, iters=3)
        b = train_centroids(emb, "vec_id", "embedding", n_cells=16, iters=3)
        assert (a == b).all()
        assert np.allclose(np.linalg.norm(a, axis=1), 1.0)

    def test_full_probe_equals_brute(self, spark, sf_tiny):
        """nprobe == n_cells searches every cell -> IVF must reproduce the
        brute-force result row for row (the rerank kernel is exact)."""
        from xorfilter_net_spark.ann.ivf import ivf_topk_cosine

        emb = spark.read.parquet(f"{sf_tiny}/embeddings.parquet")
        queries = self._queries(emb)
        exact = topk_cosine(emb, "vec_id", "embedding", queries, k=5)
        full = ivf_topk_cosine(
            emb, "vec_id", "embedding", queries, k=5, n_cells=16, nprobe=16,
            iters=3,
        )
        a = sorted(map(tuple, exact.collect()))
        b = sorted(map(tuple, full.collect()))
        assert a == b

    def test_nprobe_recall_and_exact_scores(self, spark, sf_tiny):
        from xorfilter_net_spark.ann.ivf import ivf_topk_cosine

        emb = spark.read.parquet(f"{sf_tiny}/embeddings.parquet")
        queries = self._queries(emb)
        exact = topk_cosine(emb, "vec_id", "embedding", queries, k=10)
        approx = ivf_topk_cosine(
            emb, "vec_id", "embedding", queries, k=10, n_cells=16, nprobe=6,
            iters=3,
        )
        hits = exact.join(approx, ["qid", "neighbor_id"], "left_semi").count()
        assert hits / exact.count() > 0.5
        both = exact.selectExpr("qid", "neighbor_id", "cos_e6 as c1").join(
            approx.selectExpr("qid", "neighbor_id", "cos_e6 as c2"),
            ["qid", "neighbor_id"],
        )
        assert both.filter("c1 <> c2").count() == 0


class TestPq:
    def _queries(self, emb):
        return [
            (r["vec_id"], list(r["embedding"]))
            for r in emb.filter("vec_id % 25 = 0").collect()
        ]

    def test_codebooks_deterministic_shape(self, spark, sf_tiny):
        from xorfilter_net_spark.ann.pq import train_codebooks

        emb = spark.read.parquet(f"{sf_tiny}/embeddings.parquet")
        a = train_codebooks(emb, "vec_id", "embedding", m=8, n_codes=8, iters=3)
        b = train_codebooks(emb, "vec_id", "embedding", m=8, n_codes=8, iters=3)
        assert a.shape == (8, 8, 8)  # 64-dim / m=8
        assert (a == b).all()

    def test_encode_is_m_bytes_per_vector(self, spark, sf_tiny):
        from xorfilter_net_spark.ann.pq import encode_pq, train_codebooks

        emb = spark.read.parquet(f"{sf_tiny}/embeddings.parquet")
        books = train_codebooks(emb, "vec_id", "embedding", m=8, n_codes=8, iters=3)
        codes = encode_pq(emb, "vec_id", "embedding", books).collect()
        assert len(codes) == emb.count()
        assert all(len(r["code"]) == 8 for r in codes)
        # codes are valid centroid ids
        assert all(max(r["code"]) < 8 for r in codes)

    def test_recall_and_exact_rerank_scores(self, spark, sf_tiny):
        from xorfilter_net_spark.ann.pq import pq_topk_cosine

        emb = spark.read.parquet(f"{sf_tiny}/embeddings.parquet")
        queries = self._queries(emb)
        exact = topk_cosine(emb, "vec_id", "embedding", queries, k=10)
        approx = pq_topk_cosine(
            emb, "vec_id", "embedding", queries, k=10, m=16, n_codes=16,
            iters=3, oversample=6,
        )
        hits = exact.join(approx, ["qid", "neighbor_id"], "left_semi").count()
        assert hits / exact.count() > 0.5  # loose at tiny SF
        # every returned score equals the brute-force score (rerank exact)
        both = exact.selectExpr("qid", "neighbor_id", "cos_e6 as c1").join(
            approx.selectExpr("qid", "neighbor_id", "cos_e6 as c2"),
            ["qid", "neighbor_id"],
        )
        assert both.filter("c1 <> c2").count() == 0

    def test_no_self_matches_and_k_bound(self, spark, sf_tiny):
        from xorfilter_net_spark.ann.pq import pq_topk_cosine

        emb = spark.read.parquet(f"{sf_tiny}/embeddings.parquet")
        queries = self._queries(emb)
        res = pq_topk_cosine(
            emb, "vec_id", "embedding", queries, k=5, m=8, n_codes=8, iters=3
        ).collect()
        assert all(r["qid"] != r["neighbor_id"] for r in res)
        per_q = {}
        for r in res:
            per_q[r["qid"]] = per_q.get(r["qid"], 0) + 1
        assert all(v <= 5 for v in per_q.values())


class TestConnectedComponents:
    """dedup/clusters.py: large-star/small-star CC + survivor selection."""

    @staticmethod
    def _union_find_labels(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # relabel every node with its component MINIMUM (find() roots are
        # already minima because we always parent the larger root)
        return {n: find(n) for n in parent}

    def _check(self, spark, edges):
        from xorfilter_net_spark.dedup.clusters import connected_components

        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r["id"]: r["comp"] for r in connected_components(pairs).collect()
        }
        assert got == self._union_find_labels(edges)

    def test_pair_and_chain(self, spark):
        self._check(spark, [(5, 2), (7, 8), (8, 9), (9, 10)])

    def test_adversarial_long_chain(self, spark):
        """Chain of 40 nodes: min-label propagation would need 40 rounds;
        star-contraction must finish well under max_rounds."""
        self._check(spark, [(i, i + 1) for i in range(40)])

    def test_random_graphs_match_union_find(self, spark):
        rng = np.random.default_rng(7)
        for _ in range(3):
            n = 60
            m = int(rng.integers(10, 80))
            edges = [
                (int(a), int(b))
                for a, b in rng.integers(0, n, size=(m, 2))
                if a != b
            ]
            if edges:
                self._check(spark, edges)

    def test_duplicate_and_reversed_edges(self, spark):
        self._check(spark, [(1, 2), (2, 1), (1, 2), (3, 2)])

    def test_survivors_keep_min_per_cluster(self, spark):
        from xorfilter_net_spark.dedup.clusters import (
            assign_clusters,
            near_dup_survivors,
        )

        docs = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(10)], "doc_id long, text string"
        )
        pairs = spark.createDataFrame(
            [(3, 1), (5, 3), (8, 9)], "id_a long, id_b long"
        )
        kept = sorted(
            r["doc_id"]
            for r in near_dup_survivors(docs, pairs, "doc_id").collect()
        )
        assert kept == [0, 1, 2, 4, 6, 7, 8]
        comp = {
            r["doc_id"]: r["comp_id"]
            for r in assign_clusters(docs, pairs, "doc_id").collect()
        }
        assert comp == {0: 0, 1: 1, 2: 2, 3: 1, 4: 4, 5: 1, 6: 6, 7: 7, 8: 8, 9: 8}

    def test_empty_pairs(self, spark):
        from xorfilter_net_spark.dedup.clusters import (
            connected_components,
            near_dup_survivors,
        )

        docs = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
        empty = spark.createDataFrame([], "id_a long, id_b long")
        assert connected_components(empty).count() == 0
        assert near_dup_survivors(docs, empty, "doc_id").count() == 2


class TestPrefixJoin:
    """Exact prefix-filtering all-pairs join (dedup/prefix_join.py)."""

    def _corpus(self, spark, n=24):
        rows = [(i, f"{BASE} unique tail {i} " + "pad " * i) for i in range(n)]
        base3 = rows[3][1]
        rows.append((100, base3[: int(len(base3) * 0.92)]))
        rows.append((101, base3 + " x"))
        rows.append((102, "short"))  # sub-k-gram doc exercises the fallback
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_matches_bruteforce_exact(self, spark):
        from xorfilter_net_spark.dedup.minhash import verify_pairs
        from xorfilter_net_spark.dedup.prefix_join import jaccard_prefix_join

        docs = self._corpus(spark)
        got = {
            (r["id_a"], r["id_b"], r["jaccard_e6"])
            for r in jaccard_prefix_join(docs, "doc_id", "text", tau=0.5).collect()
        }
        ids = docs.select("doc_id")
        all_pairs = (
            ids.alias("a")
            .join(ids.alias("b"), F.expr("a.doc_id < b.doc_id"))
            .selectExpr("a.doc_id as id_a", "b.doc_id as id_b")
        )
        want = {
            (r["id_a"], r["id_b"], r["jaccard_e6"])
            for r in verify_pairs(docs, all_pairs, "doc_id", "text", 500000).collect()
        }
        assert got == want
        assert (3, 100) in {(a, b) for a, b, _ in got}
        assert (3, 101) in {(a, b) for a, b, _ in got}

    def test_prefix_prunes_candidates(self, spark):
        from xorfilter_net_spark.dedup.prefix_join import prefix_filter_candidates

        docs = self._corpus(spark)
        n = docs.count()
        cands = prefix_filter_candidates(docs, "doc_id", "text", 500000).count()
        assert cands < n * (n - 1) // 2  # strictly fewer than all pairs

    def test_high_tau_matches_bruteforce(self, spark):
        from xorfilter_net_spark.dedup.minhash import verify_pairs
        from xorfilter_net_spark.dedup.prefix_join import jaccard_prefix_join

        docs = self._corpus(spark)
        got = {
            (r["id_a"], r["id_b"])
            for r in jaccard_prefix_join(docs, "doc_id", "text", tau=0.85).collect()
        }
        ids = docs.select("doc_id")
        all_pairs = (
            ids.alias("a")
            .join(ids.alias("b"), F.expr("a.doc_id < b.doc_id"))
            .selectExpr("a.doc_id as id_a", "b.doc_id as id_b")
        )
        want = {
            (r["id_a"], r["id_b"])
            for r in verify_pairs(docs, all_pairs, "doc_id", "text", 850000).collect()
        }
        assert got == want
        assert {(3, 100), (3, 101)} <= got
