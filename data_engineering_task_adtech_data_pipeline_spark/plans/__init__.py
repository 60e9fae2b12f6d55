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
    # (b) new this round, never driver-verified: the end-to-end streaming
    # dedup pipeline promotion (r12 VERDICT #1); its slot comes from
    # q24_nation_volume's retirement (r12 VERDICT #2 — redundant with
    # q128's dim-chain family; policy in COVERAGE.md)
    "q138_stream_dedup_pipeline",
    # (c) longest-unverified block: last driver-green r10 — 39 of the 40
    # r10-green entries (q21_doc_stats_by_source slips one round to r14,
    # absorbed there by the r11-green block's 2 slots of slack; recorded
    # in COVERAGE.md's rotation table)
    "q133_ivf_sq8_topk", "q11_dedup_exact", "q17_text_features",
    "q98_wav_stats", "q99_supplier_value_share",
    "q100_inactive_customer_balance", "q101_waiting_suppliers",
    "q102_gopher_gate", "q103_hybrid_rrf", "q104_char_entropy",
    "q105_dsir_weights", "q106_bigram_lm_nll",
    "q35_minhash_dedup_transitive", "q40_multimodal_features",
    "q42_chunking", "q43_sequence_packing", "q49_embedding_dup_pairs",
    "q50_ivf_topk", "q51_domain_cap", "q53_decontaminate",
    "q55_ivf_lsh_topk", "q56_pii_redaction", "q58_greedy_pack_sharded",
    "q60_duplicate_spans", "q61_export_shards", "q63_tfidf_topk",
    "q64_hll_distinct", "q65_cm_heavy_hitters",
    "q67_collapse_duplicates", "q68_semantic_dedup",
    "q69_inverted_index", "q70_dedup_against_corpus", "q71_bm25_topk",
    "q72_pq_adc_topk", "q73_salted_agg", "q74_corpus_datacard",
    "q19_token_features", "q36_hash_split", "q41_curation_pipeline",
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
