"""BPE merge learning at a realistic merge count (round 8, r7 VERDICT #5).

The q88/q94 oracle entries deliberately run few merges (the DuckDB unroll
is per-merge); this tool demonstrates the SCALE regime: >= 256 batched
merge rounds over the sf0.1 documents corpus, recording wall time and
Spark jobs per merge — the constant the round-7 verdict asked to see.
Results go into SCALING.md ("BPE at realistic merge counts").

The testdata documents corpus has only 31 distinct words (TPC-H-ish
comment vocabulary), so BPE SATURATES there — every vocab word collapses
to one symbol after ~89 merges; that saturation run is recorded as-is.
The 256+-merge regime therefore runs on a distributed synthetic Zipfian
corpus (17,576 three-letter lexemes, exponent-1 rank-frequency via a
log-uniform index, 2M tokens — built with spark.range + rand, nothing
collected), which exercises exactly the engine constant the verdict
asked about: Spark jobs per merge and seconds per merge at depth.

Usage: python tools/bpe_scale.py [n_merges] [sf_dir]
Prints one JSON line:
  {"n_merges": N, "wall_sec": W, "n_jobs": J, "jobs_per_merge": J/N,
   "n_rounds": R, "merges_per_round": N/R, "sf_dir": ..., "strict_32": ...}
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_engineering_task_adtech_data_pipeline_spark.operators import text  # noqa: E402
from data_engineering_task_adtech_data_pipeline_spark.session import get_spark  # noqa: E402
from data_engineering_task_adtech_data_pipeline_spark.sources.readers import read_table  # noqa: E402


def run(spark, docs, n_merges: int, batch: bool, group: str):
    sc = spark.sparkContext
    sc.setJobGroup(group, f"bpe {group}", interruptOnCancel=False)
    t0 = time.time()
    out = text.bpe_learn_merges(docs, n_merges=n_merges, batch=batch)
    rows = out.collect()
    wall = round(time.time() - t0, 2)
    sc.setJobGroup("idle", "idle")
    jobs = len(set(sc.statusTracker().getJobIdsForGroup(group)))
    return rows, wall, jobs


def zipf_corpus(spark, n_tokens: int = 2_000_000, seed: int = 8):
    """Distributed Zipf(1) token stream over a 26^3 lexeme space: token
    rank = floor(V^rand) (log-uniform => rank-frequency ~ 1/rank), lexeme
    = base-26 letters of the rank. One row per token; bpe_learn_merges
    collapses it to the word-frequency table in its first aggregation."""
    from pyspark.sql import functions as F

    v = 26 * 26 * 26
    rank = F.floor(F.pow(F.lit(float(v)), F.rand(seed))).cast("int") % v
    alpha = "abcdefghijklmnopqrstuvwxyz"

    def letter(e):
        return F.substring(
            F.lit(alpha), ((e % 26) + 1).cast("int"), F.lit(1)
        )

    r = F.col("__r")
    word = F.concat(
        letter(F.floor(r / 676)), letter(F.floor(r / 26)), letter(r)
    )
    return (
        spark.range(n_tokens)
        .select(rank.alias("__r"))
        .select(word.alias("text"))
    )


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("bpe-scale")
    docs = read_table(spark, sf_dir, "documents").select("text")

    # real-corpus run: saturates at the corpus's merge ceiling (31-word
    # vocabulary), recorded as-is
    rows, wall, jobs = run(spark, docs, n_merges, batch=True, group="bpe-real")
    result = {
        "sf_dir": sf_dir,
        "real_corpus": {
            "n_merges": len(rows),
            "saturated": len(rows) < n_merges,
            "wall_sec": wall,
            "n_jobs": jobs,
            "jobs_per_merge": round(jobs / max(1, len(rows)), 3),
            "sec_per_merge": round(wall / max(1, len(rows)), 3),
        },
    }

    # deep-merge regime on the synthetic Zipf corpus
    zc = zipf_corpus(spark)
    rows_z, wall_z, jobs_z = run(
        spark, zc, n_merges, batch=True, group="bpe-zipf"
    )
    result["zipf_2m_tokens"] = {
        "n_merges": len(rows_z),
        "wall_sec": wall_z,
        "n_jobs": jobs_z,
        "jobs_per_merge": round(jobs_z / max(1, len(rows_z)), 3),
        "sec_per_merge": round(wall_z / max(1, len(rows_z)), 3),
    }

    # strict baseline at a smaller count for the jobs-per-merge contrast
    _, wall_s, jobs_s = run(spark, zc, 32, batch=False, group="bpe-strict")
    result["zipf_strict_32"] = {
        "wall_sec": wall_s,
        "n_jobs": jobs_s,
        "jobs_per_merge": round(jobs_s / 32.0, 3),
        "sec_per_merge": round(wall_s / 32.0, 3),
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
