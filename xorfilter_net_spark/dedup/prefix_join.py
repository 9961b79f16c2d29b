"""Exact set-similarity self-join via prefix filtering (AllPairs/PPJoin).

The exact counterpart to the MinHash-LSH path (dedup/minhash.py): find ALL
document pairs with char-k-gram Jaccard >= tau, with a candidate set pruned
by the prefix-filtering principle (Chaudhuri-Ganti-Kaushik ICDE'06;
Bayardo-Ma-Srikant WWW'07) instead of probabilistic banding — zero false
negatives by construction, no recall parameter to tune.

Prefix principle: fix one global total order on tokens (here: document
frequency ascending, token ascending — rarest first). If J(a,b) >= tau
then |a n b| >= ceil(tau*|a|), so the pair must share at least one token
among the first p_a = |a| - ceil(tau*|a|) + 1 tokens of a (else the
overlap is capped at ceil(tau*|a|)-1), and symmetrically for b. Joining
*prefix tokens only* against *prefix tokens only* therefore misses no
qualifying pair, while shrinking the join input to ~(1-tau) of the
shingle table — and because the prefix keeps the globally RAREST tokens,
the per-token join buckets are the smallest possible ones.

Scale shape (the 100 TB plan):
- shingling is pure codegen (shared `shingle_set_expr`), one explode;
- document frequency is one token-sized aggregate; the rank join is a
  hash join on the token;
- prefix selection is a per-document window (one shuffle on doc id),
  integer arithmetic only;
- the candidate join runs on rare-first prefix tokens with an integer
  size-ratio prune (tau*|a| <= |b| <= |a|/tau, micro-int form) — both
  sides of every bucket are small by construction;
- the exact verify reuses dedup/minhash.py::verify_pairs (JVM array
  intersect over the candidate pairs only).

The reference has no join operators at all (SURVEY.md §2.2); this extends
the near-dup family the training-pipeline mandate requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .minhash import SHINGLE_K, shingle_set_expr, verify_pairs


def prefix_filter_candidates(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    tau_e6: int,
    k: int = SHINGLE_K,
) -> DataFrame:
    """Candidate (id_a, id_b) pairs guaranteed to superset all pairs with
    shingle-set Jaccard >= tau_e6/1e6 (micro-int threshold).

    Two sound prunes run before any candidate leaves this function:

    - size-ratio: J >= tau forces tau*max(|a|,|b|) <= min(|a|,|b|);
    - PPJoin positional bound: with c = |prefix_a n prefix_b| and
      (i*, j*) the per-doc ranks of the globally LAST matched prefix
      token, |a n b| <= c + min(|a| - i*, |b| - j*). Sound because each
      doc's rank order is the restriction of ONE shared global token
      order: every shared token globally <= the last match is in both
      prefixes (hence counted in c), and the shared tokens globally
      after it number at most min of the two suffix lengths. Since the
      order is shared, i* = max(pos_a) and j* = max(pos_b) are attained
      at the same token, so the bound is a plain groupBy aggregate —
      and it replaces the dropDuplicates the naive form needs (same
      single shuffle, strictly more pruning). J >= tau is equivalent to
      overlap >= alpha = ceil(tau*(|a|+|b|)/(1+tau)), all-integer here.
    """
    sh = docs.select(
        F.col(id_col).alias("pid"),
        F.explode(F.expr(shingle_set_expr(text_col, k))).alias("tok"),
    ).persist()  # feeds the df aggregate AND the rank join
    dfreq = sh.groupBy("tok").agg(F.count(F.lit(1)).alias("tdf"))
    w = Window.partitionBy("pid").orderBy(F.col("tdf").asc(), F.col("tok").asc())
    ranked = (
        sh.join(dfreq, "tok")
        .withColumn("pos", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("pid")))
    )
    # prefix length p = n - ceil(tau*n) + 1, all-integer ceil
    prefix = ranked.filter(
        F.col("pos")
        <= F.col("n") - F.expr(f"({tau_e6} * n + 999999) div 1000000") + 1
    ).select("pid", "tok", "pos", "n")
    a = prefix.select(
        F.col("pid").alias("id_a"),
        F.col("tok"),
        F.col("pos").alias("pos_a"),
        F.col("n").alias("n_a"),
    )
    b = prefix.select(
        F.col("pid").alias("id_b"),
        F.col("tok"),
        F.col("pos").alias("pos_b"),
        F.col("n").alias("n_b"),
    )
    matches = a.join(b, "tok").filter(
        (F.col("id_a") < F.col("id_b"))
        # size-ratio prune, micro-int exact: tau*max(|a|,|b|) <= min(|a|,|b|)
        & (F.col("n_a") * tau_e6 <= F.col("n_b") * 1_000_000)
        & (F.col("n_b") * tau_e6 <= F.col("n_a") * 1_000_000)
    )
    per_pair = matches.groupBy("id_a", "id_b").agg(
        F.count(F.lit(1)).alias("c"),
        F.max("pos_a").alias("i_last"),
        F.max("pos_b").alias("j_last"),
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
    )
    alpha = F.expr(
        f"({tau_e6} * (n_a + n_b) + {1_000_000 + tau_e6} - 1)"
        f" div {1_000_000 + tau_e6}"
    )
    return per_pair.filter(
        F.col("c")
        + F.least(F.col("n_a") - F.col("i_last"), F.col("n_b") - F.col("j_last"))
        >= alpha
    ).select("id_a", "id_b")


def jaccard_prefix_join(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    tau: float = 0.5,
    k: int = SHINGLE_K,
) -> DataFrame:
    """All pairs with exact char-k-gram Jaccard >= tau: prefix-filtered
    candidates -> exact verify. Output (id_a, id_b, jaccard_e6) — by
    construction identical to the exact all-pairs answer (and therefore
    row-identical to the verified MinHash path when its recall is 1)."""
    docs = docs.persist()  # feeds candidate generation AND the verify joins
    tau_e6 = int(tau * 1_000_000)
    cands = prefix_filter_candidates(docs, id_col, text_col, tau_e6, k)
    return verify_pairs(docs, cands, id_col, text_col, tau_e6, k)
