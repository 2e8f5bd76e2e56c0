"""The declared query/operator library with DuckDB oracles — public facade.

The library was a single 14.9k-line module through round 10; round 11
split it into per-family modules (VERDICT r10 item 7) with zero semantic
change. This module remains the import surface: ``QUERIES``, ``Query``,
``register_views`` and the correctness-harness knobs all live here (or
forward to ``plans.query_core``). The per-family modules register their
queries into the shared dict at import time, in the original file order,
and this module applies the driver-check ordering last.

Cross-engine determinism rules (decimal money sums, tie-broken ORDER BY,
microsecond timestamps — the contract every query follows) are documented
in ``plans/query_core.py``.
"""

from mission_data_pipeline_spark.plans import query_core as _core
from mission_data_pipeline_spark.plans.query_core import (  # noqa: F401
    QUERIES,
    Query,
    _dialect,
    _dsum,
    _q,
    _same,
    _scratch_dir,
    _sql,
    input_sample_predicate_duckdb,
    register_views,
    set_input_repartition,
    set_input_sample,
)

# Registration imports — original single-file section order, so the
# registry iterates identically to the pre-split module.
from mission_data_pipeline_spark.plans import queries_relational  # noqa: F401,E402
from mission_data_pipeline_spark.plans import queries_window  # noqa: F401,E402
from mission_data_pipeline_spark.plans import queries_textdedup  # noqa: F401,E402
from mission_data_pipeline_spark.plans import queries_multimodal  # noqa: F401,E402
from mission_data_pipeline_spark.plans import queries_operator_api  # noqa: F401,E402
from mission_data_pipeline_spark.plans import queries_stats  # noqa: F401,E402
from mission_data_pipeline_spark.plans import queries_tpch  # noqa: F401,E402
from mission_data_pipeline_spark.plans import queries_io_misc  # noqa: F401,E402
from mission_data_pipeline_spark.plans import queries_curation  # noqa: F401,E402


def __getattr__(name):
    """Forward dynamic module globals (``_SCRATCH_ROOT``,
    ``_INPUT_REPARTITION``, ...) to ``query_core`` — the knob setters
    mutate query_core's globals, so reads must resolve there, not on an
    import-time snapshot."""
    return getattr(_core, name)


# Driver-check ordering (STALEST-FIRST, regenerated per round from the
# CORRECTNESS_r0*.json history). The driver verifies the first ~50
# QUERIES entries per round. Round 14 (VERDICT r13 item 3 + ADVICE r13):
# slots 1-5 are the four r08-stale queries plus the plan-changed-but-
# r09-stale x2_incremental_near_dedup_stored (the manifest format bump
# touches its read path); slot 6 is the NEW x3_pq_tie_guard_recall
# (252nd query — never driver-checked); slots 7-50 are 44 of the 49
# remaining r09-stale queries in alphabetical order. The cut at 50
# falls on slots 51-55: FIVE designated STATIC PURE-SQL roll-overs
# (set_except, set_bag_semantics_all, join_anti, join_null_safe_eq,
# rollup_flag_status — oracle+lint+perturb-swept locally at sf0.01 AND
# sfx1 every round by scripts/round_gate.sh), placed AT the cut this
# time so the r13 slot-51 staleness failure (a non-roll-over rolled
# past the window while the designated ones absorbed nothing) cannot
# recur. Slots 56-58: this round's plan-changed-but-r13-fresh queries
# (tie-aware recall denominator, PQ tie_extend default, compaction
# format preservation) for any window wider than 55.
# ---------------------------------------------------------------------------

_CHECK_FIRST = [
    "x2_incremental_near_dedup_stored",
    "x6_json_extract_agg",
    "w_analytic_functions",
    "w_ranking_functions",
    "w_running_sum",
    "x3_pq_tie_guard_recall",  # NEW this round (252nd query)
    "agg_approx_percentile_bound",
    "agg_distinct_by_group",
    "agg_hll_distinct_bound",
    "agg_kll_quantile_bound",
    "agg_theta_distinct_bound",
    "agg_two_phase_distinct",
    "agg_value_histogram",
    "agg_variance_manual",
    "curation_chunk_tokens",
    "curation_content_filter",
    "curation_filter_threshold_sweep",
    "curation_normalize_text",
    "curation_quality_dedup",
    "curation_split_assign",
    "curation_temperature_sample",
    "curation_weighted_sample",
    "decode_golden_matrix",
    "grouping_sets_mixed",
    "j_fuzzy_match_join",
    "limit_check_alarm",
    "q12_shipmode_priority",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_part_count",
    "q17_small_quantity_revenue",
    "q1_pricing_summary",
    "q22_global_sales_opportunity",
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "s2_native_unpivot",
    "s3_filter_pushdown_in",
    "w1_native_tumbling_window",
    "w1_streaming_tumbling",
    "w4_native_session_window",
    "w4_streaming_dedup",
    "w_ewma_smooth",
    "x1_incremental_dedup",
    "x2_embedding_near_dup",
    "x2_substring_dedup_bpe",
    "x3_prototype_prune",
    "x4_token_count_bpe",
    "x5_frame_sample",
    "set_except",
    "set_bag_semantics_all",
    "join_anti",
    "join_null_safe_eq",
    "rollup_flag_status",
    "x3_ann_recall_tie_aware",
    "x3_pq_rerank_topk",
    "x2_near_dedup_compacted_index",
]

# Reorder IN PLACE (ADVICE r11): rebinding this module's QUERIES to a
# shallow copy would desync it from query_core.QUERIES — any later
# registration via the re-exported ``_q`` would land only in query_core's
# dict and be invisible to every consumer of the facade. clear()+update()
# keeps the two names aliased to one dict forever.
_ordered = {
    **{name: QUERIES[name] for name in _CHECK_FIRST},
    **{name: q for name, q in QUERIES.items() if name not in _CHECK_FIRST},
}
QUERIES.clear()
QUERIES.update(_ordered)
del _ordered

