"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``xorfilter_net_spark.entrypoints`` — the driver runs
``entry(spark)`` as a smoke check, each ``queries()[name]`` at sf=0.01,
and compares against ``oracle_sql()[name]`` via DuckDB (row-count +
schema + order-insensitive value-hash).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from xorfilter_net_spark import entrypoints  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return entrypoints.entry(spark)


def _already_green() -> tuple[set[str], set[str]]:
    """(green in ANY round, green in a round NEWER than the r03 oracle
    changes) from the CORRECTNESS files."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    green: set[str] = set()
    recent: set[str] = set()
    for p in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            rounds = json.load(open(p))
        except Exception:
            continue
        if not isinstance(rounds, dict):
            continue
        m = re.search(r"_r(\d+)", os.path.basename(p))
        rnum = int(m.group(1)) if m else 0
        for name, row in rounds.items():
            if not isinstance(row, dict) or row.get("err"):
                continue
            rows_only = name not in entrypoints.ORACLES
            if (
                row.get("rows_match", True) is not False
                and row.get("schema_match", True) is not False
                # rows-only queries have no value hash to match, so a
                # missing/None hash field still counts as verified for
                # them; value-checkable queries need hash_match=True —
                # a row written before the oracle existed (or by a
                # format without the hash field) must NOT deprioritize
                # an unverified query in the rotation
                and (row.get("hash_match") is True or rows_only)
            ):
                green.add(name)
                if rnum > _RECHECK_AS_OF_ROUND:
                    recent.add(name)
    return green, recent


# Names with a GREEN prior row whose oracle SQL or query code changed
# this round: forced back into the unverified block so the driver
# re-certifies the CURRENT contract (a stale green row must not let a
# changed oracle ride unverified). A green row in any round NEWER than
# _RECHECK_AS_OF_ROUND (the round whose oracles these changes postdate)
# clears the recheck — once the driver has certified the new contract
# these names fall back to the verified block, so the set does not
# permanently occupy front slots in later rounds.
_RECHECK_AS_OF_ROUND = 3
_RECHECK = {
    # media codec gates: `select true` oracles -> literal expected-row
    # value oracles (r04)
    "media_png_codec_ok",
    "media_wav_codec_ok",
    "media_avi_codec_ok",
    # encode oracle rewritten as a recursive walk (r04)
    "wordpiece_encode_stats",
    # exact_ntile null-ordering/determinism rework (r04)
    "q_ntile_doc_length_buckets",
    # dv gate: boolean oracle -> per-stage value-count oracle (r04)
    "dv_delete_semantics_ok",
    # AMS F2 gate: boolean oracle -> exact-F2 value oracle (r04)
    "countsketch_f2_users_ok",
}

# Unverified queries ordered for the r04 burn-down (59 never-sampled as
# of r03 + the r04 additions): changed-oracle rechecks and the four new
# gates first, then the text-curation half of the stack and the
# streaming-state family (the operators a curation user composes daily
# — r03 verdict item 1), then compliance/PCA, the rolling-window and
# validation families, and the graph/relational tail. Names already
# green in a prior round drop out naturally.
_FRONT = [
    # changed oracle/code, green r03 — re-certify first (cheap)
    "dv_delete_semantics_ok",
    "countsketch_f2_users_ok",
    "media_png_codec_ok",
    "media_wav_codec_ok",
    "media_avi_codec_ok",
    "wordpiece_encode_stats",
    "q_ntile_doc_length_buckets",
    # gates registered in r04 (previously gate-less components)
    "maintenance_compaction_ok",
    "streaming_incremental_sketch_ok",
    "scan_pushdown_ok",
    "unigram_invariants_ok",
    # r04 new operators (transcript hygiene + cleaning + search)
    "conversation_lint_report",
    "q_merge_consecutive_turns",
    "decayed_topk_event_types",
    "q_attribution_linear",
    "streaming_decayed_topk",
    "rolling_quantile_event_values",
    "reconcile_tables_documents",
    "q_context_budget_turns",
    "c4_line_clean_documents",
    "substring_search_documents",
    # text-curation family
    "text_features",
    "q_tfidf_topk_terms",
    "q_token_cooccurrence",
    "lm_coverage_documents",
    "contamination_report_documents",
    "q_pack_sequences_documents",
    "q_mixture_interleave_documents",
    "cdc_chunks_documents",
    "q_token_bucket_counts",
    "hash_embed_ann_ok",
    "quality_classifier_ok",
    "dsir_selection_ok",
    "contamination_xor_pruned_documents",
    "q_assemble_conversations",
    "q_token_spans_stats",
    "bpe_encode_distinct_parity",
    # streaming-state family
    "streaming_drift_monitor_ok",
    "streaming_merge_versions",
    "streaming_rolling_distinct",
    "streaming_topk_tools",
    "streaming_rolling_anomaly",
    "streaming_ivm_view",
    "streaming_transcript_pairs",
    # compliance / PCA / media surfaces certified by pytest only
    "gdpr_purge_ok",
    "fd_projection_ok",
    "phash_near_dup_media",
    "media_resize_stats",
    "drift_report_ok",
    # dedup stragglers + the strengthened unigram pair
    "editdist_near_dup_pairs",
    "simhash_separation_gates",
    "span_index_incremental",
    "unigram_pieces_documents",
    "unigram_encode_stats",
    # validation / profiling / IVM
    "data_validation_report",
    "data_validation_suggested",
    "ivm_agg_view_documents",
    "skip_index_point_lookup",
    "q_profile_events",
    # graph / relational tail
    "q_assoc_rules_copurchase",
    "q_bfs_recursive_cte",
    "q_attribution_last_touch",
    "q_trend_event_values",
    "q_filter_pruned_join",
    "q_skew_aware_join",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry, ordered for maximal cumulative driver-oracle coverage:
    queries WITHOUT a green row in a prior round's CORRECTNESS file come
    first (user-visible/changed-oracle names in ``_FRONT`` before the
    rest, then cheapest first per the measured sf0.01 wall costs in
    tools/query_costs.json), already-verified ones after. A driver that
    samples a prefix — by count or by time budget — therefore always
    spends its budget on unverified queries; semantics of each entry are
    unchanged."""
    import json

    qs = dict(entrypoints.QUERIES)
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        costs = json.load(open(os.path.join(here, "tools/query_costs.json")))
    except Exception:
        costs = {}
    green_all, green_recent = _already_green()
    green = (green_all - _RECHECK) | (green_recent & _RECHECK)
    front = {n: i for i, n in enumerate(_FRONT)}
    order = sorted(
        qs,
        key=lambda n: (
            n in green,
            front.get(n, len(front)),
            costs.get(n, 3.0),
            n,
        ),
    )
    return {n: qs[n] for n in order}


def oracle_sql() -> dict[str, str]:
    return dict(entrypoints.ORACLES)
