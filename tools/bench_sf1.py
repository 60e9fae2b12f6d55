"""Frozen sf1 bench series (round 7, r6 VERDICT #2): promotes the 10x
stress run into a recorded, committed artifact so scale claims carry a
per-round trend line instead of one-off SCALING.md tables.

Protocol (frozen, mirrors bench.py):
- data: sf0.1 plus the sf1-equivalent directory built by
  ``tools/scale_stress.generate`` (10 shifted near-duplicate replicas of
  sf0.1 — real dedup/ANN work, not a degenerate exact-collapse);
- warm-up: every table in BOTH directories scanned once, plus untimed
  ``Q.prepare`` per entry (serving indexes are built outside the timer);
- action: noop sink (full column materialization — count() is NOT a
  valid action, see bench.py);
- per-query number: MEDIAN of 3 solo runs, both scales timed in the same
  session so the ratio is box-drift-free;
- query subset: FIXED (below) — the reference-parity core + the headline
  dedup/text/ANN/serving family. Changing the subset breaks the trend
  line; add new entries at the END and keep old ones.

Usage: python tools/bench_sf1.py [--out BENCH_SF1_rN.json] [--regen]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_engineering_task_adtech_data_pipeline_spark.operators import chunking  # noqa: E402
from data_engineering_task_adtech_data_pipeline_spark.schemas import TESTDATA_TABLES  # noqa: E402
from data_engineering_task_adtech_data_pipeline_spark.session import get_spark  # noqa: E402
from data_engineering_task_adtech_data_pipeline_spark.sources.readers import read_table  # noqa: E402

from scale_stress import DST, SRC, generate  # noqa: E402

N_RUNS = 3

# FROZEN subset — append-only (see module docstring)
QUERIES = [
    "q01_pricing_summary", "q02_campaign_totals", "q03_daily_rollup",
    "q04_daily_ctr_report", "q05_delta_antijoin", "q06_upsert_dedup",
    "q07_totals_report", "q08_distinct_projection", "q09_stats",
    "q59_merge_upsert",
    "q13_minhash_dedup", "q60_duplicate_spans", "q68_semantic_dedup",
    "q86_ivf_pq_serve", "q87_line_dedup", "q88_bpe_learn_merges",
    "q89_unigram_nll", "q90_pagerank", "q91_window_ranks",
    "q92_scd2_history", "q93_weighted_sample", "q94_bpe_tokenize",
    "q95_small_quantity_revenue", "q96_retention_cohorts",
    "q97_event_funnel",
    "q98_wav_stats", "q99_supplier_value_share",
    "q100_inactive_customer_balance",
    # appended r7 after the r7 artifact was recorded (append-only rule):
    # first measured in BENCH_SF1_r08
    "q101_waiting_suppliers", "q102_gopher_gate", "q103_hybrid_rrf",
    "q105_dsir_weights", "q107_triangle_count", "q108_phrase_search",
    # appended r8 (r7 VERDICT #6: the remaining r7 text/TPC-H/multimodal
    # family gets a scale trend line) + the r8 video entries; first
    # measured in BENCH_SF1_r08
    "q104_char_entropy", "q106_bigram_lm_nll", "q109_hist_quantiles",
    "q110_audio_resample", "q111_cheapest_supplier", "q112_image_ahash",
    "q113_image_dup_groups", "q114_variant_extract",
    "q115_pseudonymized_join", "q116_temporal_split",
    "q117_video_stats", "q118_video_frame_dups",
    # appended r8 (new this round): TPC-H Q18/Q20 shapes, theta-sketch
    # overlap, exact stratified split, record linkage + entity clusters,
    # hot-key split join; first measured in BENCH_SF1_r08
    "q119_large_volume_orders", "q120_dominant_suppliers",
    "q121_kmv_overlap", "q122_stratified_split", "q123_record_linkage",
    "q124_hot_key_join", "q125_entity_clusters", "q126_top_supplier",
    "q127_trailing_revenue", "q128_nation_trade_volume",
    "q129_visual_near_dups", "q130_audio_fingerprint_dups",
    # appended r9 (r8 VERDICT #2: the expensive ANN/dedup family — the
    # 12 slowest sf0.1 bench entries — plus every remaining query >=2 s
    # at sf0.1 and the new r9 entries); first measured in BENCH_SF1_r09
    "q78_ivf_pq_topk", "q85_crossmodal_curation", "q55_ivf_lsh_topk",
    "q67_collapse_duplicates", "q35_minhash_dedup_transitive",
    "q72_pq_adc_topk", "q50_ivf_topk", "q49_embedding_dup_pairs",
    "q19_token_features", "q80_rank_metrics", "q70_dedup_against_corpus",
    "q16_lsh_topk", "q14_simhash_candidates", "q12_ngram_jaccard",
    "q54_contamination_report", "q17_text_features",
    "q74_corpus_datacard", "q71_bm25_topk", "q75_winnow_match_pairs",
    "q48_jaccard_verify", "q53_decontaminate", "q15_cosine_topk",
    "q64_hll_distinct", "q65_cm_heavy_hitters", "q132_sq8_topk",
    # appended r10 (r9 VERDICT #3: the remaining sub-2 s tail — the full
    # battery is now trended) + the r10 addition q133; first measured in
    # BENCH_SF1_r10
    "q11_dedup_exact", "q21_doc_stats_by_source", "q36_hash_split",
    "q40_multimodal_features", "q41_curation_pipeline", "q42_chunking",
    "q43_sequence_packing", "q58_greedy_pack_sharded", "q51_domain_cap",
    "q56_pii_redaction", "q57_bigram_novelty", "q61_export_shards",
    "q62_quantile_filter", "q63_tfidf_topk", "q66_mixture_sample",
    "q69_inverted_index", "q73_salted_agg", "q76_hard_negatives",
    "q77_budget_select", "q79_bpe_pair_counts", "q81_zipf_fit",
    "q82_curriculum_stages", "q83_validate", "q84_snapshot_diff",
    "q131_stream_daily_ingest", "q133_ivf_sq8_topk",
    "q22_revenue_filter", "q23_top_orders", "q24_nation_volume",
    "q25_set_ops", "q26_pivot_events", "q27_grouping_sets",
    "q28_window_calendar", "q29_asof_join", "q30_range_join",
    "q31_sessionize", "q32_percentiles", "q33_profile",
    "q34_json_extract", "q37_exists_anti",
    "q39_order_count_distribution", "q44_string_functions",
    "q46_array_agg",
    # appended r11 (r10 VERDICT #5): the persisted IVF,SQ8 serving entry
    # and the oracle-checked streaming KMV monitor; first measured in
    # BENCH_SF1_r11
    "q134_ivf_sq8_serve", "q135_stream_kmv_monitor",
    # appended r12 (r11 VERDICT #5): the persisted MinHash dedup index
    # serving entry and the component-store overlay read; first measured
    # in BENCH_SF1_r12
    "q136_minhash_index_serve", "q137_component_store",
    # appended r13 (r12 VERDICT #1): the end-to-end streaming dedup
    # pipeline entry; first measured in BENCH_SF1_r13
    "q138_stream_dedup_pipeline",
    # appended r14 (r13 VERDICT #1): the Bloom membership prefilter —
    # the last sketch family promoted to the oracle battery; first
    # measured in BENCH_SF1_r14
    "q139_bloom_prefilter",
]

# Battery entries RETIRED from the registry (COVERAGE.md rotation policy)
# keep their position in the frozen list above for trend-line history but
# are skipped at run time; their rows simply end at the retirement round.
RETIRED = {"q24_nation_volume"}  # r13: redundant with q128's family



def _median(xs: list[float]) -> float:
    return sorted(xs)[len(xs) // 2]


def main() -> None:
    out_path = "BENCH_SF1.json"
    argv = sys.argv[1:]
    if "--out" in argv:
        out_path = argv[argv.index("--out") + 1]

    # box-speed denominator for cross-round comparisons (r12 VERDICT #4:
    # the sf1 files carried no probe, so cross-round per-query ratios —
    # the q17/q41 watch — needed a prose re-adjudication every round);
    # tools/bench_compare.py divides ratios by it. Within-file sf1/sf0.1
    # ratios never needed it (both legs share the session).
    from bench import _cpu_probe
    cpu_probe = _cpu_probe()
    spark = get_spark("bench_sf1")
    marker = Path(DST) / "_built_ok"
    if "--regen" in argv or not marker.exists():
        print("generating sf1-equivalent data ...")
        generate(spark)
        marker.write_text("ok")

    from data_engineering_task_adtech_data_pipeline_spark.plans import REGISTRY

    # warm-up: footers + page cache for both dirs; untimed index builds
    for d in (SRC, DST):
        for t in TESTDATA_TABLES:
            read_table(spark, d, t).count()
    queries_live = [n for n in QUERIES if n not in RETIRED]
    for name in queries_live:
        q = REGISTRY[name]
        if q.prepare is not None:
            q.prepare(spark, SRC)
            q.prepare(spark, DST)

    base_runs: dict[str, list[float]] = {n: [] for n in queries_live}
    sf1_runs: dict[str, list[float]] = {n: [] for n in queries_live}
    for _ in range(N_RUNS):
        for name in queries_live:
            q = REGISTRY[name]
            t0 = time.time()
            q.spark(spark, SRC).write.format("noop").mode("overwrite").save()
            base_runs[name].append(time.time() - t0)
            t0 = time.time()
            q.spark(spark, DST).write.format("noop").mode("overwrite").save()
            sf1_runs[name].append(time.time() - t0)
            chunking.release_persisted()

    queries = {}
    for name in queries_live:
        b, s = _median(base_runs[name]), _median(sf1_runs[name])
        queries[name] = {
            "sf0.1_sec": round(b, 3),
            "sf1_sec": round(s, 3),
            "ratio": round(s / b, 2),
        }
        print(f"  {name}: {b:.2f}s -> {s:.2f}s ({s / b:.1f}x)")

    payload = {
        "metric": "sf1_scale_series",
        "protocol": "median-of-3, noop sink, warm tables, untimed prepare",
        "data": "sf1-equivalent: 10 shifted near-dup replicas of sf0.1 "
                "(tools/scale_stress.generate)",
        "n_queries": len(queries),
        "total_sf01": round(sum(q["sf0.1_sec"] for q in queries.values()), 2),
        "total_sf1": round(sum(q["sf1_sec"] for q in queries.values()), 2),
        "max_ratio": max(q["ratio"] for q in queries.values()),
        "cpu_probe": cpu_probe,
        "queries": queries,
    }
    Path(out_path).write_text(json.dumps(payload, indent=1) + "\n")
    print(f"recorded: {out_path}  (max ratio "
          f"{payload['max_ratio']}x on 10x data)")
    spark.stop()


if __name__ == "__main__":
    main()
