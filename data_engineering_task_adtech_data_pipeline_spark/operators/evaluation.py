"""Retrieval-quality evaluation: the metrics layer over the search
operators (BM25, ANN top-k) — recall@k, precision@k, MRR, NDCG per query
against a binary-relevance truth set.

Pure built-in expressions; every float metric is engineered for
engine-portability the same way the battery queries are: per-hit DCG
contributions are rounded to 6 dp and summed as DECIMAL (summation order
can never show through), MRR is one exact IEEE division, and
recall/precision derive from exact integer counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rank_metrics(
    results: DataFrame,
    truth: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "corpus_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query ranking metrics at cutoff ``k``.

    ``results``: (query_col, doc_col, rank_col) ranked retrieval output
    (1-based ranks). ``truth``: (query_col, doc_col) binary-relevant
    pairs. Output one row per TRUTH query: n_rel, hits, recall_at_k,
    precision_at_k, mrr (1/first-relevant-rank, 0 when none), ndcg
    (binary-gain DCG/IDCG, log2 discounts). Queries with relevant docs
    but no results score zero; result-set queries absent from ``truth``
    are dropped (no denominator).

    Scale shape: two aggregations on the query key plus one equi-join of
    results against truth — both frames are top-k-sized per query, so the
    whole evaluation is queries x k rows regardless of corpus size.
    """
    dcg_c = F.round(
        1.0 / F.log2(F.col(rank_col).cast("double") + 1.0), 6
    ).cast("decimal(18,6)")
    hits = (
        results.where(F.col(rank_col) <= k)
        .join(truth, [query_col, doc_col])
        .groupBy(query_col)
        .agg(
            F.count(F.lit(1)).alias("hits"),
            F.min(rank_col).alias("__first"),
            F.sum(dcg_c).alias("__dcg"),
        )
    )
    idcg_c = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.least(F.lit(k), F.col("n_rel"))),
            lambda i: F.round(
                1.0 / F.log2(i.cast("double") + 1.0), 6
            ).cast("decimal(18,6)"),
        ),
        F.lit(0).cast("decimal(28,6)"),
        # decimal addition widens the scale-carrying precision by 1; cast
        # back so the fold's accumulator type stays fixed (k <= ~1e21
        # terms before 28,6 could overflow — unreachable)
        lambda acc, x: (acc + x).cast("decimal(28,6)"),
    )
    per_q = truth.groupBy(query_col).agg(F.count(F.lit(1)).alias("n_rel"))
    out = per_q.join(hits, query_col, "left")
    return out.select(
        query_col,
        "n_rel",
        F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
        (
            F.coalesce(F.col("hits"), F.lit(0)).cast("double")
            / F.col("n_rel")
        ).alias("recall_at_k"),
        (
            F.coalesce(F.col("hits"), F.lit(0)).cast("double") / F.lit(float(k))
        ).alias("precision_at_k"),
        F.coalesce(
            1.0 / F.col("__first").cast("double"), F.lit(0.0)
        ).alias("mrr"),
        F.coalesce(
            F.col("__dcg").cast("double") / idcg_c.cast("double"),
            F.lit(0.0),
        ).alias("ndcg"),
    )
