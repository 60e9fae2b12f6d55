"""10x-scale stress run (round 6): validates TESTDATA.md's sf1 notes with
measured numbers instead of predictions.

Generates an sf1-equivalent directory in /tmp by replicating the sf0.1
tables 10x with shifted keys (documents get per-replica suffix words so
replicas are NEAR-duplicates — real work for minhash/spans/semdedup, not
a degenerate exact-collapse; embeddings get deterministic jitter), then
runs a representative slice of the ACTUAL battery REGISTRY — same code,
same entry points — at sf0.1 and at 10x in one session and reports the
wall ratio per query. Linear-ish ratios (~<=10x on 10x data) mean the
plan scales with data; sub-linear means fixed overhead still dominates;
super-linear flags a shape that would not survive 100 TB.

Usage: python tools/scale_stress.py [--regen]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from data_engineering_task_adtech_data_pipeline_spark.schemas import TESTDATA_TABLES  # noqa: E402
from data_engineering_task_adtech_data_pipeline_spark.session import get_spark  # noqa: E402
from data_engineering_task_adtech_data_pipeline_spark.sources.readers import read_table  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1_stress"
REPLICAS = 10

# (table, id columns to shift per replica) — keys stay unique across
# replicas; foreign keys shift consistently so joins keep their fan-out
SHIFTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    # dims replicate UNshifted (customer/part/supplier/nation/region):
    # the fact side grows 10x against fixed dims, like a real corpus
}

QUERIES = [
    "q01_pricing_summary",     # scan + hash agg
    "q02_campaign_totals",     # multi-join + aggs
    "q31_sessionize",          # window over events
    "q13_minhash_dedup",       # LSH dedup (near-dup replicas!)
    "q60_duplicate_spans",     # positional grams + islands
    "q68_semantic_dedup",      # trained cells + capped pairs
    "q43_sequence_packing",    # distributed prefix sum
    "q87_line_dedup",          # line-hash df + positional rebuild
    "q89_unigram_nll",         # vocab join scoring
    "q72_pq_adc_topk",         # PQ train + ADC
    "q86_ivf_pq_serve",        # persisted-index serving
]


def _max_of(spark, table: str, col: str) -> int:
    return read_table(spark, SRC, table).agg(F.max(col)).first()[0]


def generate(spark) -> None:
    for t in TESTDATA_TABLES:
        src = read_table(spark, SRC, t)
        if t not in SHIFTS:
            src.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
            continue
        parts = []
        offs = {c: _max_of(spark, t, c) + 1 for c in SHIFTS[t]}
        for k in range(REPLICAS):
            rep = src
            for c, off in offs.items():
                rep = rep.withColumn(c, (F.col(c) + F.lit(k * off)).cast("long"))
            if t == "documents" and "text" in rep.columns:
                # replicas are NEAR-dups: same body + replica suffix words
                rep = rep.withColumn(
                    "text",
                    F.concat(F.col("text"), F.lit(f" rep{k} tag{k} mark{k}")),
                )
            if t == "embeddings":
                rep = rep.withColumn(
                    "embedding",
                    F.transform(
                        F.col("embedding"),
                        lambda x: (x + F.randn(seed=77 + k) * 0.01).cast(
                            "float"
                        ),
                    ),
                )
            # orders carries o_custkey -> keep pointing at the fixed dims;
            # lineitem l_orderkey shifts in lockstep with orders o_orderkey
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        n = spark.read.parquet(f"{DST}/{t}.parquet").count()
        print(f"  generated {t}: {n} rows")


def main() -> None:
    spark = get_spark("scale_stress")
    marker = Path(DST) / "_built_ok"
    if "--regen" in sys.argv or not marker.exists():
        print("generating 10x stress data ...")
        generate(spark)
        marker.write_text("ok")

    from data_engineering_task_adtech_data_pipeline_spark.plans import REGISTRY

    # warm both directories' footers/page cache
    for d in (SRC, DST):
        for t in TESTDATA_TABLES:
            read_table(spark, d, t).count()

    print("| query | sf0.1 s | 10x s | ratio | 10x rows |")
    print("|---|---|---|---|---|")
    for name in QUERIES:
        q = REGISTRY[name]
        if q.prepare is not None:
            q.prepare(spark, SRC)
            q.prepare(spark, DST)
        # noop sink = full evaluation (count() lets Catalyst skip
        # cardinality-preserving pipelines entirely — see bench.py)
        t0 = time.time()
        q.spark(spark, SRC).write.format("noop").mode("overwrite").save()
        base = time.time() - t0
        t0 = time.time()
        big_df = q.spark(spark, DST)
        big_df.write.format("noop").mode("overwrite").save()
        big = time.time() - t0
        big_rows = big_df.count()
        print(
            f"| {name} | {base:.2f} | {big:.2f} | {big / base:.1f}x |"
            f" {big_rows} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
