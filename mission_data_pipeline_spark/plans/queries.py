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
# QUERIES entries per round. Round 12: slots 1-2 are the round-12
# additions/changes (the multi-rep bucket-cap query is NEW; the zipf
# rank was re-planned); slot 3 is x6_variant_json_shred (slot 51 of
# the r11 list — it missed the 50-query window, so its latest check is
# still r06); the rest is the complete r07 staleness tail in
# alphabetical order, with three pure-SQL dialect queries (static
# since r07, oracle+lint+perturb-swept locally at sf0.01 AND sfx1
# every round by scripts/round_gate.sh) last as the lowest-risk
# roll-over if the window again cuts at 50 — they lead the r13 list.
# ---------------------------------------------------------------------------

_CHECK_FIRST = [
    "x2_lsh_bucket_cap_reps",
    "x4_zipf_slope",
    "x6_variant_json_shred",
    "agg_cms_heavy_hitters",
    "correlated_scalar_subquery",
    "curation_segment_dedup",
    "curation_url_canonical_dedup",
    "d3_pivot_wide",
    "d4_union_all",
    "d8_top_n_preview",
    "date_extract_parts",
    "filter_between_range",
    "g_label_propagation",
    "g_triangle_count",
    "j2_left_join_config",
    "join_cross_small",
    "join_semi_exists",
    "l_hdf5_roundtrip",
    "l_zorder_roundtrip",
    "q3_shipping_priority",
    "q5_bucketed_broadcast_dims",
    "s2_unpivot_melt",
    "s_gzip_jsonl_ingest",
    "s_rs_frame_correction",
    "s_rs_frames_decom_e2e",
    "s_zip_archive_ingest",
    "set_union_distinct",
    "t10_piecewise_clamp",
    "t5_string_functions",
    "t7_coalesce_fallback",
    "t8_filter_exclude",
    "t9_polynomial_calibration",
    "udtf_token_spans",
    "w1_tumbling_window",
    "w3_streaming_ewma",
    "w_ewma_sharded",
    "w_ewma_smoothing",
    "w_holt_trend",
    "w_holt_winters_seasonal",
    "w_lag_delta_gap",
    "x3_kmeans_lloyd",
    "x5_adpcm_sample_stats",
    "x5_audio_sample_stats",
    "x5_avi_audio_stats",
    "x5_bmp_gif_pixel_stats",
    "x5_flac_sample_stats",
    "x5_g711_sample_stats",
    "x5_image_dhash_near_dup",
    "x5_media_stats",
    "x5_tiff_pixel_stats",
    "set_intersect",
    "join_full_outer",
    "join_right",
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

