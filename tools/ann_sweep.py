"""Recall-vs-cost sweep for the three ANN operators.

Measures recall@k against ``brute_force_topk`` ground truth plus wall-clock
per configuration, at the benchmark scale factor. Turns the ANN parameter
guidance in docstrings/SCALING.md into data: more bands (lsh) or probes
(ivf) buy recall with more candidate-join work.

Usage: python tools/ann_sweep.py [sf_dir] [k] [--clustered]
Prints one markdown table row per configuration.

``--clustered`` swaps the testdata embeddings (near-uniform — IVF's worst
case, cells carve arbitrary Voronoi borders through an unclustered cloud)
for a synthetic mixture-of-Gaussians corpus (>= 20k vectors): 32 centers
with per-dim sigma 1.0 against center spread ~3 — clusters that OVERLAP
at the margins, the regime real embedding corpora live in (semantic
clusters with fuzzy borders). Trained cell routing (ivf/hybrid) adapts
its Voronoi cells to the actual cluster structure; lsh's random
hyperplanes cannot, so banding loses recall exactly where the clusters
blur together.
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


def clustered_corpus(spark, n: int, dim: int = 64, n_clusters: int = 32,
                     sigma: float = 1.0, tmp: str = "/tmp/ann_sweep_mog"):
    """Deterministic-enough mixture of Gaussians, generated DISTRIBUTED
    (spark.range + seeded randn — no driver-side numpy materialization)
    and written to parquet once so every sweep row reads identical data
    (randn's values depend on partition layout, so the parquet snapshot is
    what makes timings/recalls comparable across configurations)."""
    cl = F.col("vec_id") % n_clusters
    cols = F.array(
        *[
            (
                3.0 * F.sin(cl * 997 + F.lit(d))
                + F.randn(seed=4242 + d) * sigma
            ).cast("float")
            for d in range(dim)
        ]
    )
    df = spark.range(n).select(
        F.col("id").alias("vec_id"), cols.alias("embedding")
    )
    df.write.mode("overwrite").parquet(tmp)
    return spark.read.parquet(tmp)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    clustered = "--clustered" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    k = int(args[1]) if len(args) > 1 else 10
    spark = get_spark("ann-sweep")
    emb = Testdata(spark, sf_dir).embeddings
    if clustered:
        n = max(emb.count(), 20_000)
        emb = clustered_corpus(spark, n)
        print(f"clustered mixture-of-Gaussians corpus: {n} vectors, 32 centers")
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
    ivf_grid = [(8, 1), (8, 2), (8, 4)] + (
        [(32, 1), (32, 2), (32, 4)] if "--clustered" in sys.argv else []
    )
    for n_cells, n_probe in ivf_grid:
        row(
            "ivf_topk",
            f"cells={n_cells} probe={n_probe}",
            lambda c=n_cells, p=n_probe: similarity.ivf_topk(
                emb, queries, k=k, n_cells=c, n_probe=p, dim=64
            ),
        )
    hyb_cells = 32 if "--clustered" in sys.argv else 8
    for n_probe, max_h in [(2, 6), (2, 9), (4, 12)]:
        row(
            "ivf_lsh_topk",
            f"cells={hyb_cells} probe={n_probe} max_hamming={max_h}",
            lambda p=n_probe, h=max_h: similarity.ivf_lsh_topk(
                emb, queries, k=k, n_cells=hyb_cells, n_probe=p,
                planes=16, max_hamming=h, dim=64,
            ),
        )
    # int8 scalar quantization (round 9): shortlist is the recall lever —
    # integer dots rank so close to exact cosine that small shortlists
    # already saturate; wall measures the codes-only scan + tiny re-rank.
    for shortlist in [k, 2 * k, 4 * k]:
        row(
            "sq8_topk",
            f"shortlist={shortlist}",
            lambda s=shortlist: similarity.sq8_topk(
                emb, queries, k=k, shortlist=s
            ),
        )
    # IVF-PQ funnel: ADC shortlist re-ranked by exact cosine — recall here
    # measures the whole funnel against the cosine ground truth. ADC is an
    # L2 structure, so the corpus is L2-NORMALIZED first (unit sphere:
    # squared L2 = 2 - 2*cosine, making ADC rank like cosine — the
    # standard FAISS practice; cosine itself is scale-invariant, so the
    # re-ranked scores and the ground truth are unchanged).
    emb_n = similarity.normalize_embeddings(emb)
    for n_probe, rr in [(2, 50), (4, 50), (4, 200)]:
        row(
            "ivf_pq_topk",
            f"cells={hyb_cells} probe={n_probe} m=8 codes=16 rerank={rr} (L2-normalized)",
            lambda p=n_probe, r=rr: similarity.ivf_pq_topk(
                emb_n, similarity.normalize_embeddings(queries),
                k=k, n_cells=hyb_cells, n_probe=p,
                m=8, n_codes=16, dim=64, rerank=r,
            ),
        )


if __name__ == "__main__":
    main()
