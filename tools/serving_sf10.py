"""sf10 point for the persisted-serving family (round 13, r12 VERDICT
#5): the O(batch) serving claim was measured at 10x (BENCH_SF1_r12 —
q136 1.20x, q137 1.02x, q134 1.04x on 10x data); this records a 100x
point so the claim is an extrapolation-free statement across two decades
of corpus growth.

Data: /tmp/sf10_serving holds ONLY the two tables the serving entries
touch — documents and embeddings — replicated 100x from sf0.1 with the
scale_stress recipe (shifted ids; per-replica suffix words so document
replicas are NEAR-duplicates — real index pressure, not an exact
collapse; deterministic embedding jitter). 500k docs / 200k vectors.

Protocol (mirrors tools/bench_sf1.py): cpu_probe recorded, both dirs'
tables warmed, per-entry prepare UNTIMED (index/store builds are the
offline path — the claim under test is serving cost), noop-sink action,
median of 3 solo runs per scale in one session (ratios box-drift-free).

Usage: python tools/serving_sf10.py [--out BENCH_SF10_rN.json] [--regen]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from data_engineering_task_adtech_data_pipeline_spark.session import get_spark  # noqa: E402
from data_engineering_task_adtech_data_pipeline_spark.sources.readers import read_table  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf10_serving"
REPLICAS = 100
TABLES = ("documents", "embeddings")  # all the serving entries touch

# the persisted-serving family: fixed-size batch / read against a
# data-sized stored corpus — the entries whose wall should stay ~flat
QUERIES = [
    "q134_ivf_sq8_serve",
    "q136_minhash_index_serve",
    "q137_component_store",
    # q138 is EXCLUDED by design, not oversight: its fixed waves
    # (doc_id<175, 175..349) are 100% near-duplicated by their 99 base
    # replicas under this data recipe — the pipeline correctly accepts
    # ZERO docs, so the "serving" read measures an empty table. Its
    # scale story is carried by q136 (same index serving kernel) and
    # q137 (same store read) here, and by its own sf1 row.
]

N_RUNS = 3


def generate(spark) -> None:
    for t in TABLES:
        src = read_table(spark, SRC, t)
        id_col = {"documents": "doc_id", "embeddings": "vec_id"}[t]
        off = src.agg(F.max(id_col)).first()[0] + 1
        parts = []
        for k in range(REPLICAS):
            rep = src.withColumn(
                id_col, (F.col(id_col) + F.lit(k * off)).cast("long")
            )
            if t == "documents":
                rep = rep.withColumn(
                    "text",
                    F.concat(F.col("text"), F.lit(f" rep{k} tag{k} mark{k}")),
                )
            else:
                rep = rep.withColumn(
                    "embedding",
                    F.transform(
                        F.col("embedding"),
                        lambda x: (x + F.randn(seed=77 + k) * 0.01).cast(
                            "float"
                        ),
                    ),
                )
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        print(f"  generated {t}: "
              f"{spark.read.parquet(f'{DST}/{t}.parquet').count()} rows")


def _median(xs: list[float]) -> float:
    return sorted(xs)[len(xs) // 2]


def main() -> None:
    out_path = "BENCH_SF10.json"
    argv = sys.argv[1:]
    if "--out" in argv:
        out_path = argv[argv.index("--out") + 1]

    from bench import _cpu_probe
    cpu_probe = _cpu_probe()
    spark = get_spark("serving_sf10")
    marker = Path(DST) / "_built_ok"
    if "--regen" in argv or not marker.exists():
        print("generating 100x serving data ...")
        generate(spark)
        marker.write_text("ok")

    from data_engineering_task_adtech_data_pipeline_spark.plans import REGISTRY

    for d in (SRC, DST):
        for t in TABLES:
            read_table(spark, d, t).count()
    prepare_s = {}
    for name in QUERIES:
        q = REGISTRY[name]
        t0 = time.time()
        q.prepare(spark, SRC)
        base_prep = time.time() - t0
        t0 = time.time()
        q.prepare(spark, DST)
        prepare_s[name] = {
            "sf0.1_s": round(base_prep, 1),
            "sf10_s": round(time.time() - t0, 1),
        }
        print(f"  prepared {name}: {prepare_s[name]}")

    base_runs = {n: [] for n in QUERIES}
    big_runs = {n: [] for n in QUERIES}
    rows_big = {}
    for _ in range(N_RUNS):
        for name in QUERIES:
            q = REGISTRY[name]
            t0 = time.time()
            q.spark(spark, SRC).write.format("noop").mode("overwrite").save()
            base_runs[name].append(time.time() - t0)
            t0 = time.time()
            df = q.spark(spark, DST)
            df.write.format("noop").mode("overwrite").save()
            big_runs[name].append(time.time() - t0)
            if name not in rows_big:  # setdefault would re-count() every
                rows_big[name] = df.count()  # run (eager default arg)

    queries = {}
    for name in QUERIES:
        b, s = _median(base_runs[name]), _median(big_runs[name])
        queries[name] = {
            "sf0.1_sec": round(b, 3),
            "sf10_sec": round(s, 3),
            "ratio": round(s / b, 2),
            "sf10_rows": rows_big[name],
        }
        print(f"  {name}: {b:.2f}s -> {s:.2f}s ({s / b:.1f}x on 100x data)")

    payload = {
        "metric": "sf10_serving_series",
        "protocol": "median-of-3, noop sink, warm tables, untimed prepare",
        "data": "sf10-equivalent: 100 shifted near-dup replicas of sf0.1 "
                "documents+embeddings (tools/serving_sf10.generate)",
        "replicas": REPLICAS,
        "n_queries": len(queries),
        "max_ratio": max(q["ratio"] for q in queries.values()),
        "cpu_probe": cpu_probe,
        "prepare_untimed_sec": prepare_s,
        "queries": queries,
    }
    Path(out_path).write_text(json.dumps(payload, indent=1) + "\n")
    print(f"recorded: {out_path} (max ratio "
          f"{payload['max_ratio']}x on 100x data)")
    spark.stop()


if __name__ == "__main__":
    main()
