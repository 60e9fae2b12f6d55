from .battery import REGISTRY, Q  # noqa: F401
from . import battery_ext  # noqa: F401  (registers q11+ into REGISTRY)
from . import battery_rel  # noqa: F401  (registers q22+ into REGISTRY)

# ---------------------------------------------------------------------------
# Driver correctness-window ordering.
#
# The round driver value-checks only the FIRST 50 entries of
# ``__spark_entry__.queries()``; the registry holds more. This list pins the
# window to (a) the 10 reference-parity core queries, (b) every entry that
# had never had a driver-green row AS OF this round's rotation (entries
# added after the window filled — q119+ — ride the recorded local gate,
# ORACLE_FULL_r{N}.json, and lead next round's block (b)), and (c) the
# longest-unverified stable block, rotated back in. All entries keep full
# coverage in
# ``tools/oracle_check.py`` (which checks the ENTIRE registry) regardless of
# position. Rotation policy + per-query last-driver-verified round:
# COVERAGE.md §"Driver window rotation".
# ---------------------------------------------------------------------------
DRIVER_WINDOW: list[str] = [
    # (a) reference-parity core — always in window
    "q01_pricing_summary", "q02_campaign_totals", "q03_daily_rollup",
    "q04_daily_ctr_report", "q05_delta_antijoin", "q06_upsert_dedup",
    "q59_merge_upsert", "q07_totals_report", "q08_distinct_projection",
    "q09_stats",
    # (b) new this round, never driver-verified: the persisted MinHash
    # LSH dedup index serving promotion (r11 VERDICT #1) and the
    # oracle-checked persisted component store (r11 VERDICT #2)
    "q136_minhash_index_serve", "q137_component_store",
    # (c) longest-unverified block: last driver-green r9 — the full
    # 38 remaining entries of the r9-green family (q12/q13 were pulled
    # forward into r11's fill and stay out; the two slots they freed
    # absorb the two (b) promotions, per the rotation plan recorded in
    # COVERAGE.md at r11)
    "q119_large_volume_orders", "q120_dominant_suppliers",
    "q121_kmv_overlap", "q122_stratified_split", "q123_record_linkage",
    "q124_hot_key_join", "q125_entity_clusters", "q126_top_supplier",
    "q127_trailing_revenue", "q128_nation_trade_volume",
    "q129_visual_near_dups", "q130_audio_fingerprint_dups",
    "q92_scd2_history", "q95_small_quantity_revenue",
    "q96_retention_cohorts", "q97_event_funnel",
    "q22_revenue_filter", "q23_top_orders", "q24_nation_volume",
    "q25_set_ops", "q26_pivot_events", "q27_grouping_sets",
    "q28_window_calendar", "q29_asof_join", "q30_range_join",
    "q31_sessionize", "q32_percentiles", "q33_profile",
    "q34_json_extract", "q37_exists_anti",
    "q39_order_count_distribution", "q44_string_functions",
    "q46_array_agg", "q131_stream_daily_ingest", "q132_sq8_topk",
    "q14_simhash_candidates", "q15_cosine_topk", "q16_lsh_topk",
]


def ordered_registry() -> dict[str, Q]:
    """REGISTRY reordered so ``DRIVER_WINDOW`` entries come first (in that
    order), followed by the remaining entries in registration order."""
    out: dict[str, Q] = {}
    for name in DRIVER_WINDOW:
        if name in REGISTRY:
            out[name] = REGISTRY[name]
    for name, q in REGISTRY.items():
        if name not in out:
            out[name] = q
    return out
