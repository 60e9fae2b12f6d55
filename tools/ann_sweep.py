"""Recall-vs-cost sweep for the three ANN operators.

Measures recall@k against ``brute_force_topk`` ground truth plus wall-clock
per configuration, at the benchmark scale factor. Turns the ANN parameter
guidance in docstrings/SCALING.md into data: more bands (lsh) or probes
(ivf) buy recall with more candidate-join work.

Usage: python tools/ann_sweep.py [sf_dir] [k]
Prints one markdown table row per configuration.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from data_engineering_task_adtech_data_pipeline_spark.operators import similarity  # noqa: E402
from data_engineering_task_adtech_data_pipeline_spark.session import get_spark  # noqa: E402
from data_engineering_task_adtech_data_pipeline_spark.sources.readers import Testdata  # noqa: E402


def pairs(df) -> set[tuple[int, int]]:
    return {(r.query_id, r.corpus_id) for r in df.collect()}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("ann-sweep")
    emb = Testdata(spark, sf_dir).embeddings
    emb.count()  # warm the file cache so timings compare configurations
    queries = emb.where(F.col("vec_id") < 20)

    truth = pairs(similarity.brute_force_topk(emb, queries, k=k))
    t0 = time.time()
    pairs(similarity.brute_force_topk(emb, queries, k=k))
    brute_s = time.time() - t0
    print(f"ground truth: {len(truth)} pairs; brute force {brute_s:.2f}s (warm)")
    print("\n| operator | params | recall@%d | wall s |" % k)
    print("|---|---|---|---|")

    def row(name: str, params: str, fn) -> None:
        fn()  # warm run: JIT + file cache, timing is steady-state
        t = time.time()
        got = pairs(fn())
        wall = time.time() - t
        recall = len(got & truth) / len(truth)
        print(f"| {name} | {params} | {recall:.3f} | {wall:.2f} |")

    for planes, bands in [(16, 4), (16, 8), (24, 8)]:
        row(
            "lsh_topk",
            f"planes={planes} bands={bands}",
            lambda p=planes, b=bands: similarity.lsh_topk(
                emb, queries, k=k, planes=p, bands=b
            ),
        )
    for n_cells, n_probe in [(8, 1), (8, 2), (8, 4)]:
        row(
            "ivf_topk",
            f"cells={n_cells} probe={n_probe}",
            lambda c=n_cells, p=n_probe: similarity.ivf_topk(
                emb, queries, k=k, n_cells=c, n_probe=p, dim=64
            ),
        )
    for n_probe, max_h in [(2, 6), (2, 9), (4, 12)]:
        row(
            "ivf_lsh_topk",
            f"probe={n_probe} max_hamming={max_h}",
            lambda p=n_probe, h=max_h: similarity.ivf_lsh_topk(
                emb, queries, k=k, n_cells=8, n_probe=p,
                planes=16, max_hamming=h, dim=64,
            ),
        )


if __name__ == "__main__":
    main()
