"""End-to-end training-data curation: one composed, shuffle-bounded plan.

The training-pipeline operators this library mandates (exact dedup,
quality/language gating, benchmark decontamination, deterministic
splitting) are individually oracle-gated; this module composes them into
the pipeline a data-curation run actually executes, as ONE lazy DataFrame
plan — no materialization boundaries between stages, so Catalyst prunes
columns and pushes work across stage seams (e.g. the feature projection
only ever computes the two columns the gate reads).

Stage shapes at 100 TB (nothing here collects or re-reads the corpus):

1. exact dedup (``dedup/exact.py``) — the only corpus-sized shuffle in
   the whole pipeline, and it carries (hash, id, text-group key) not
   exploded tokens;
2. quality/language gate (``text/analysis.py``) — map-only whole-stage
   codegen over the survivors, staged projections so the regex/split
   intermediates evaluate once per row;
3. benchmark decontamination (``text/contamination.py``) — codegen
   shingling, broadcast (or XOR-filter-pruned) eval shingle set; only
   matched pairs shuffle, the corpus itself never does; docs flagged at
   >= ``contam_threshold_pct``% 5-gram overlap are dropped via a
   broadcast anti-join;
4. deterministic split (``relational/sampling.py``) — map-only
   content-keyed md5 labeling, reproducible across runs, partitionings
   and engines.

The reference has no pipeline surface at all (it is a single in-memory
filter build, BaseXorFilter.cs:21); this is the training-data mandate's
capstone composition. Every stage's semantics are individually
oracle-gated; the composed output is itself gated end-to-end
(``curate_corpus_documents``) against a DuckDB CTE chain built from the
same dialect-templated expression set — structural parity, not a
reimplementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dedup.exact import exact_dedup
from ..relational.sampling import split_hash
from ..text.analysis import with_text_features
from ..text.contamination import contamination_report


def curate_corpus(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: int = 60,
    langs: tuple[str, ...] = ("en",),
    contam_n: int = 5,
    contam_threshold_pct: int = 50,
    val_fraction: float = 0.1,
    prune: str = "broadcast",
    max_dup_line_frac_e6: int | None = None,
    max_top_bigram_frac_e6: int | None = None,
    min_bigram_coverage_e6: int | None = None,
    lm_min_count: int = 2,
    reuse: str = "checkpoint",
) -> DataFrame:
    """Curate a raw document corpus for training.

    Returns one row per surviving document:
    ``(id_col, lang_pred, quality_score, split)`` where ``split`` is
    'train' or 'val' by deterministic content hash. Survivors are the
    exact-dedup canonical rows that pass the quality/language gate and
    are NOT contaminated against ``eval_df`` (>= threshold%% distinct
    word-``contam_n``-gram overlap).

    ``prune='xor'`` routes decontamination through the XOR-filter
    pre-pruned path (row-identical by construction).

    ``reuse='checkpoint'`` (default) lazily local-checkpoints the gate
    survivors: that subtree is consumed by THREE downstream branches
    (contamination shingles, contamination totals, the final clean
    join), and without a seam each action recomputes dedup+features per
    branch — measured 18-25s -> much less at sf0.1, and at corpus scale
    the survivors table is exactly what a production pipeline would
    materialize between stages. ``reuse='none'`` keeps the single fully
    lazy plan (Catalyst prunes across every seam; same rows either
    way — the driver oracle runs against the default path).

    The two optional ``max_*`` thresholds add the Gopher repetition gate
    (``text/repetition.py``) between the quality gate and
    decontamination; ``min_bigram_coverage_e6`` adds the CCNet-style
    corpus-LM fluency gate (``text/ngram_lm.py``, statistics from the
    deduped corpus). All optional gates default to off so the base
    pipeline plan is unchanged.
    """
    deduped = exact_dedup(docs, id_col, [text_col])
    feats = with_text_features(deduped.select(id_col, text_col), text_col)
    kept = feats.filter(
        (F.col("quality_score") >= min_quality)
        & F.col("lang_pred").isin(list(langs))
    )
    if max_dup_line_frac_e6 is not None or max_top_bigram_frac_e6 is not None:
        from ..text.repetition import repetition_signals

        sig = repetition_signals(kept.select(id_col, text_col), id_col, text_col)
        cond = F.lit(True)
        if max_dup_line_frac_e6 is not None:
            cond &= (
                F.coalesce("dup_line_frac_e6", F.lit(0))
                <= max_dup_line_frac_e6
            )
        if max_top_bigram_frac_e6 is not None:
            cond &= (
                F.coalesce("top_bigram_frac_e6", F.lit(0))
                <= max_top_bigram_frac_e6
            )
        kept = kept.join(sig.filter(cond).select(id_col), id_col, "left_semi")
    if min_bigram_coverage_e6 is not None:
        # CCNet-style fluency gate: coverage statistics come from the
        # DEDUPED corpus (duplicate-free counts), the gate applies to the
        # quality survivors — text/ngram_lm.py
        from ..text.ngram_lm import lm_coverage_signals

        lm = lm_coverage_signals(
            deduped.select(id_col, text_col), id_col, text_col, lm_min_count
        )
        kept = kept.join(
            lm.filter(
                F.col("coverage_e6") >= min_bigram_coverage_e6
            ).select(id_col),
            id_col,
            "left_semi",
        )
    if reuse == "checkpoint":
        # one materialization feeding all three consumers; lazy so a
        # never-executed plan costs nothing
        kept = kept.localCheckpoint(eager=False)
    report = contamination_report(
        kept.select(id_col, text_col),
        eval_df,
        id_col,
        text_col,
        n=contam_n,
        threshold_pct=contam_threshold_pct,
        prune=prune,
    )
    contaminated = report.filter("contaminated").select(id_col)
    clean = kept.join(F.broadcast(contaminated), id_col, "left_anti")
    return split_hash(clean, [text_col], val_fraction).select(
        id_col, "lang_pred", "quality_score", "split"
    )
