"""Quantify the salted two-phase agg on a pathological hot key.

Generates an events frame where ONE campaign owns ~30% of all rows (the
SCALING.md stress shape), then times:

  a. plain  groupBy(campaign).agg(...)        -- baseline
  b. salted salted_agg(campaign, 32 buckets)  -- functions/skew.py

for two aggregate classes:

  - algebraic  (count + max): Spark's partial HashAggregate already collapses
    the hot key map-side, so salting should NOT win here — recording that is
    the point (don't salt what the engine already solves);
  - holistic   (collect_list size): partial state is O(rows-per-key), the hot
    key's list rides one reduce task; salting splits it 32 ways.

Round 10 (r9 VERDICT #8) adds the JOIN section: fact(rows, one hot key
at `hot_share`) ⟕ dim(10M rows with a 64-char payload — genuinely too
large to broadcast; a skinny 2M-row dim compresses UNDER the 10 MB
autoBroadcast file-size estimate and Spark rightly just broadcasts it),
comparing

  a. plain shuffle join              -- AQE's call (left-outer skew)
  b. hot_key_split_join              -- census computed inline (3 scans)
  c. hot_key_split_join(hot_keys=..) -- precomputed census (2 scans)

and ASSERTS the split plan's shape (hot arm BroadcastHashJoin + tail arm
shuffle join) before timing, so the table can't silently measure a
collapsed plan.

Usage: python tools/skew_bench.py [rows] [hot_share]
Appends nothing; prints a JSON line — copy results into SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_engineering_task_adtech_data_pipeline_spark.functions.skew import (  # noqa: E402
    hot_key_census,
    hot_key_split_join,
    salted_agg,
)
from data_engineering_task_adtech_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    hot_share = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3
    spark = get_spark()
    # run-private scratch dir (r10 ADVICE): a hardcoded /tmp path leaked
    # ~700 MB per run and let concurrent benches overwrite each other's
    # data mid-read
    scratch = tempfile.mkdtemp(prefix="skew_bench_")

    # hot key 0 gets `hot_share` of rows; the rest spread over 10k keys
    df = (
        spark.range(rows)
        .withColumn(
            "campaign_id",
            F.when(F.rand(42) < hot_share, F.lit(0)).otherwise(
                (F.rand(43) * 10_000).cast("long") + 1
            ),
        )
        .withColumn("created_at", F.current_timestamp())
    )
    events_path = os.path.join(scratch, "events")
    df.write.mode("overwrite").parquet(events_path)
    df = spark.read.parquet(events_path)

    def t(fn) -> float:
        start = time.time()
        fn()
        return round(time.time() - start, 2)

    res: dict[str, float] = {}

    res["algebraic_plain"] = t(
        lambda: df.groupBy("campaign_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("created_at").alias("wm"))
        .write.mode("overwrite").format("noop").save()
    )
    res["algebraic_salted"] = t(
        lambda: salted_agg(
            df,
            ["campaign_id"],
            partials={"n": F.count(F.lit(1)), "wm": F.max("created_at")},
            merges={"n": F.sum("n"), "wm": F.max("wm")},
        ).write.mode("overwrite").format("noop").save()
    )

    res["holistic_plain"] = t(
        lambda: df.groupBy("campaign_id")
        .agg(F.size(F.collect_list("id")).alias("n_ids"))
        .write.mode("overwrite").format("noop").save()
    )
    res["holistic_salted"] = t(
        lambda: salted_agg(
            df,
            ["campaign_id"],
            partials={"n_ids": F.size(F.collect_list("id"))},
            merges={"n_ids": F.sum("n_ids")},
        ).write.mode("overwrite").format("noop").save()
    )

    # ---- hot-key split join (r9 VERDICT #8) ------------------------------
    # dim genuinely too large to broadcast (10M rows with a 64-char
    # payload: ~700 MB on disk — 2M skinny rows compressed UNDER the
    # 10 MB autoBroadcast file-size estimate and got broadcast, which
    # is the right plan there but not the scenario this section
    # measures), keyed over the fact's key space so the hot key
    # matches; left join = the arm AQE's skew splitter is most
    # constrained on.
    dim = spark.range(10_000_000).select(
        F.col("id").alias("dim_key"),
        (F.col("id") % 97).alias("attr"),
        F.repeat(F.md5(F.col("id").cast("string")), 2).alias("pad"),
    )
    dim_path = os.path.join(scratch, "dim")
    dim.write.mode("overwrite").parquet(dim_path)
    dim = spark.read.parquet(dim_path)

    census = hot_key_census(df, "campaign_id", hot_threshold=1_000_000)
    census = census.persist()
    n_hot = census.count()  # materialize the census outside the timers
    res["n_hot_keys"] = n_hot

    split = hot_key_split_join(
        df, dim, "campaign_id", "dim_key", hot_threshold=1_000_000,
        how="left",
    )
    # plan assertion BEFORE timing: hot arm broadcast, tail arm shuffle —
    # a collapsed plan would make the comparison meaningless
    plan = split._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan[:2000]

    res["join_plain"] = t(
        lambda: df.join(
            dim, df.campaign_id == dim.dim_key, "left"
        ).write.mode("overwrite").format("noop").save()
    )
    res["join_split_inline_census"] = t(
        lambda: hot_key_split_join(
            df, dim, "campaign_id", "dim_key", hot_threshold=1_000_000,
            how="left",
        ).write.mode("overwrite").format("noop").save()
    )
    res["join_split_precomputed_census"] = t(
        lambda: hot_key_split_join(
            df, dim, "campaign_id", "dim_key", how="left", hot_keys=census,
        ).write.mode("overwrite").format("noop").save()
    )
    census.unpersist()

    print(json.dumps({"rows": rows, "hot_share": hot_share, **res}))
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
