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
    # (b) new this round, never driver-verified: the Bloom membership
    # prefilter promotion (r13 VERDICT #1 — the last sketch family moved
    # onto the value-checked path). Registry grows to 131: the cycle now
    # carries a DOCUMENTED one-entry relaxation instead of a retirement
    # (r13 VERDICT #2 decision; arithmetic in COVERAGE.md)
    "q139_bloom_prefilter",
    # (b') the one r10-green entry that slipped the r13 rotation —
    # re-certified here as planned (COVERAGE.md reserved its slot)
    "q21_doc_stats_by_source",
    # (c) longest-unverified block: last driver-green r11 — 38 of the 40
    # r11-green entries: the r8-green family re-certified in r11 (36)
    # plus the r11 promotions q134/q135. q12/q13 (r11 fill) SLIP one
    # round to r15 under the documented relaxation — both stable since
    # round 4, zero code delta since, full-registry bit-exact gate at
    # two scales every round in between (COVERAGE.md rotation table)
    "q134_ivf_sq8_serve", "q135_stream_kmv_monitor",
    "q48_jaccard_verify", "q54_contamination_report",
    "q57_bigram_novelty", "q62_quantile_filter", "q66_mixture_sample",
    "q107_triangle_count", "q108_phrase_search", "q109_hist_quantiles",
    "q110_audio_resample", "q111_cheapest_supplier", "q112_image_ahash",
    "q113_image_dup_groups", "q114_variant_extract",
    "q115_pseudonymized_join", "q116_temporal_split", "q117_video_stats",
    "q118_video_frame_dups",
    "q75_winnow_match_pairs", "q76_hard_negatives", "q77_budget_select",
    "q78_ivf_pq_topk", "q79_bpe_pair_counts", "q80_rank_metrics",
    "q81_zipf_fit", "q82_curriculum_stages", "q83_validate",
    "q84_snapshot_diff", "q85_crossmodal_curation", "q86_ivf_pq_serve",
    "q87_line_dedup", "q88_bpe_learn_merges", "q89_unigram_nll",
    "q90_pagerank", "q91_window_ranks", "q93_weighted_sample",
    "q94_bpe_tokenize",
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
