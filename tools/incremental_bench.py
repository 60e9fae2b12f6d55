"""Quantify the round-11 incremental-maintenance operators against their
from-scratch baselines — the measurements behind two SCALING.md claims:

1. COMPONENT STORE: folding a small edge batch into a persisted
   assignment table (`components_update` — contracted closure + two
   broadcast passes, changed-rows-only delta append) vs re-running
   `connected_components_star` over the full accumulated edge set and
   rewriting the table. The incremental path should be ~O(batch) while
   the rebuild is O(corpus) PER BATCH — the gap should WIDEN with base
   size.

2. BLOOM PREFILTER: `contamination_matches(broadcast_benchmark=False)`
   — the corpus-scale-benchmark regime where both gram sides shuffle —
   with and without `bench_bloom=`. The bloom arm pays k broadcast
   probes per corpus gram to shrink the shuffled gram stream to
   (matching + fp) rows; it should win when the match rate is low
   (the normal decontamination case: almost nothing is contaminated).

Usage: python tools/incremental_bench.py [base_rows] [batch_edges] [docs]
Prints a JSON line — copy results into SCALING.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_engineering_task_adtech_data_pipeline_spark.operators import dedup  # noqa: E402
from data_engineering_task_adtech_data_pipeline_spark.session import get_spark  # noqa: E402


def _timed(fn):
    t0 = time.monotonic()
    out = fn()
    return out, round(time.monotonic() - t0, 2)


def bench_components(spark, scratch: str, base_rows: int, batch_edges: int):
    """Incremental fold vs full rebuild, at 1x and 4x base size."""
    results = {}
    for mult in (1, 4):
        n = base_rows * mult
        root = f"{scratch}/comp_{mult}x"
        # base: n/2 two-member components (a realistic dedup shape:
        # mostly tiny clusters), stored as parquet
        base = spark.range(n).select(
            F.col("id"), (F.col("id") - F.pmod("id", F.lit(2))).alias("component")
        )
        dedup.components_write(base, root)
        # batch: edges merging random existing pairs + some new ids
        batch = spark.range(batch_edges).select(
            F.pmod(F.xxhash64("id"), F.lit(n)).alias("id_a"),
            (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(n)) + n).alias("id_b"),
        )
        _, t_inc = _timed(lambda: dedup.components_update(spark, root, batch))

        # rebuild baseline: closure over base-as-edges + batch, full rewrite
        base_edges = spark.read.parquet(f"{root}/base").select(
            F.col("id").alias("id_a"), F.col("component").alias("id_b")
        )
        rebuild_root = f"{scratch}/comp_rebuild_{mult}x"

        def rebuild():
            assigns = dedup.connected_components_star(
                base_edges.unionByName(batch)
            )
            dedup.components_write(assigns, rebuild_root)

        _, t_full = _timed(rebuild)
        results[f"{mult}x"] = {
            "base_rows": n,
            "incremental_sec": t_inc,
            "rebuild_sec": t_full,
            "speedup": round(t_full / max(t_inc, 1e-9), 1),
        }
    return results


def bench_bloom_decon(spark, docs: int):
    """Non-broadcastable-benchmark contamination with/without the bloom
    prefilter. Benchmark = 2% of corpus docs verbatim (so ~2% of grams
    match; 98% of the corpus gram shuffle is waste the bloom removes)."""
    words = [f"w{i}" for i in range(5000)]
    corpus = spark.range(docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(60)),
                lambda i: F.element_at(
                    F.array(*[F.lit(w) for w in words]),
                    (F.pmod(F.xxhash64("id", i), F.lit(len(words))) + 1).cast(
                        "int"
                    ),
                ),
            ),
        ).alias("text"),
    ).localCheckpoint()
    benchmark = corpus.where(F.pmod("doc_id", F.lit(50)) == 0).localCheckpoint()
    grams = dedup.benchmark_grams(benchmark).localCheckpoint()
    m, k = 1 << 24, 5
    bloom = dedup.benchmark_bloom(grams, m, k).localCheckpoint()

    def plain():
        return dedup.contamination_matches(
            corpus, None, broadcast_benchmark=False, bench_grams=grams
        ).count()

    def bloomed():
        return dedup.contamination_matches(
            corpus,
            None,
            broadcast_benchmark=False,
            bench_grams=grams,
            bench_bloom=bloom,
            bloom_bits=m,
            bloom_hashes=k,
        ).count()

    n_plain, t_plain = _timed(plain)
    n_bloom, t_bloom = _timed(bloomed)
    assert n_plain == n_bloom, (n_plain, n_bloom)
    return {
        "docs": docs,
        "flagged": n_plain,
        "plain_sec": t_plain,
        "bloom_sec": t_bloom,
        "speedup": round(t_plain / max(t_bloom, 1e-9), 2),
    }


def main() -> None:
    base_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    batch_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    docs = int(sys.argv[3]) if len(sys.argv) > 3 else 120_000
    spark = get_spark()
    scratch = tempfile.mkdtemp(prefix="incr_bench_")
    try:
        out = {
            "components": bench_components(spark, scratch, base_rows, batch_edges),
            "bloom_decon": bench_bloom_decon(spark, docs),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
