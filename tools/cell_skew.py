"""Cell-size skew audit for the IVF serving path (round-6 stretch #7).

Question: on a CLUSTERED corpus (the regime where IVF wins — SCALING.md
clustered-corpus sweep), do trained cells end up skewed enough that one
hot cell dominates probed-cell scan time at serving?

Method: build the ann_sweep mixture-of-Gaussians corpus, train k-means at
cells ≈ clusters (the recommended regime) and at cells < clusters (the
misconfigured regime), and report the per-cell population distribution
plus the serving-relevant number — the expected probed-cell population
for a query workload (cells weighted by how often queries probe them),
versus the uniform ideal n/cells.

Usage: python tools/cell_skew.py [n_vectors] [--cells 32[,8,...]]
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
from tools.ann_sweep import clustered_corpus  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 20000
    cells_list = [32, 8]
    for i, a in enumerate(sys.argv):
        if a == "--cells" and i + 1 < len(sys.argv):
            cells_list = [int(x) for x in sys.argv[i + 1].split(",")]
    spark = get_spark("cell_skew")
    emb = clustered_corpus(spark, n)
    emb.count()  # materialize the parquet snapshot before timing anything

    print(f"corpus: {n} vectors, 32 true centers")
    print("| cells | n_probe | min | p50 | max | max/ideal | "
          "E[probed pop]/probe | uniform ideal | train s |")
    print("|---|---|---|---|---|---|---|---|---|")
    for n_cells in cells_list:
        t0 = time.time()
        cents = similarity.kmeans_fit(emb, n_cells=n_cells, n_iter=3, dim=64)
        train_s = time.time() - t0
        assigned = similarity._with_cell(
            similarity.with_double_embedding(emb), "embedding", cents, 64
        )
        pops = {
            r.cell: r.cnt
            for r in assigned.groupBy("cell").agg(
                F.count(F.lit(1)).alias("cnt")
            ).collect()
        }
        sizes = sorted(pops.get(c, 0) for c in range(n_cells))
        ideal = n / n_cells
        for n_probe in (1, 2):
            # probe frequency: how often each cell appears among queries'
            # probed cells — every corpus vector doubles as a query here
            # (worst-case volume), so probe mass mirrors data density
            probed = similarity._with_probed_cells(
                similarity.with_double_embedding(emb).select(
                    F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("__q_emb"),
                ),
                "__q_emb", cents, n_probe, 64,
            )
            freq = {
                r.cell: r.cnt
                for r in probed.groupBy("cell").agg(
                    F.count(F.lit(1)).alias("cnt")
                ).collect()
            }
            total_probes = sum(freq.values())
            exp_pop = sum(
                freq.get(c, 0) * pops.get(c, 0) for c in range(n_cells)
            ) / max(total_probes, 1)
            print(
                f"| {n_cells} | {n_probe} | {sizes[0]} | "
                f"{sizes[len(sizes) // 2]} | {sizes[-1]} | "
                f"{sizes[-1] / ideal:.2f} | {exp_pop:.0f} | {ideal:.0f} | "
                f"{train_s:.1f} |"
            )
    spark.stop()


if __name__ == "__main__":
    main()
