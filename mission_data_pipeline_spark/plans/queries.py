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
# QUERIES entries per round. Round 11: slots 1-6 are the round-11
# additions/changes (the giant-LSH-bucket cap, the shard-build
# capstone — now itself capped via max_bucket=50, HTML→text
# extraction, the text→vector ANN bridge, the NULL-lang-fixed UniMax
# oracle, the single-featurize streaming-ingest compacted index);
# the rest is the complete r06 staleness tail — after the r11 driver
# window no query's most recent driver check predates r07.
# ---------------------------------------------------------------------------

_CHECK_FIRST = [
    "x2_lsh_bucket_cap",
    "curation_shard_build_e2e",
    "curation_html_extract",
    "x3_text_embed_ann",
    "curation_unimax_sample",
    "x2_near_dedup_compacted_index",
    "curation_c4_signals",
    "curation_decontaminate",
    "curation_leakage_safe_split",
    "curation_quality_tiers",
    "curation_token_packing",
    "g_pagerank",
    "j_aqe_skew_split",
    "j_dynamic_partition_pruning",
    "j_runtime_bloom_filter",
    "l_compact_roundtrip",
    "l_schema_evolution_merge",
    "q3_bucketed_colocated",
    "q5_nation_revenue",
    "s1_ccsds_datasource_scan",
    "s1_ccsds_streaming_tail",
    "s_corrupt_file_skip",
    "w4_sessionization",
    "w_lttb_downsample",
    "w_resample_grid_gapfill",
    "x2_canonical_per_cluster",
    "x2_duplicate_components",
    "x2_duplicate_span_fraction",
    "x2_lsh_near_dedup_survivors",
    "x2_semantic_dedup",
    "x3_ivf_disk_index_topk",
    "x4_bigram_logprob",
    "x4_bm25_relevance",
    "x4_bpe_corpus_budget",
    "x4_bpe_token_stats",
    "x4_bpe_vocab_freq",
    "x4_heldout_backoff_logprob",
    "x4_lang_id_confusion",
    "x4_linear_probe_fit",
    "x4_repetition_signals",
    "x4_tfidf_sparse",
    "x4_top_terms",
    "x4_unigram_logprob",
    "x4_zipf_slope",
    "x5_avi_meta_decode",
    "x5_image_pixel_stats",
    "x5_image_resize",
    "x5_jpeg_pixel_stats",
    "x5_multimodal_features",
    "x5_video_frame_stats",
    "x6_variant_json_shred",
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

