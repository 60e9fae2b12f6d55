"""Pandas-UDF (Arrow/NumPy) variant of the cosine scorer — the documented
"slow path done right" for operators whose inner loop outgrows built-in
expressions.

The built-in ``F.zip_with``+``F.aggregate`` cosine in ``similarity.py`` is
the default (JVM-side, no Python). This module exists because at large
embedding dimensionality the per-element lambda interpreter loses to a
single vectorized NumPy matmul per Arrow batch; ``bench_cosine_variants``
measures the crossover instead of guessing (numbers recorded in SCALING.md).

Also the demonstration that row-at-a-time Python UDFs are never the answer:
``cosine_topk_pandas`` processes whole Arrow batches; a ``@F.udf`` version
would serialize row-by-row and lose by orders of magnitude.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE = T.StructType(
    [
        T.StructField("query_id", T.LongType()),
        T.StructField("corpus_id", T.LongType()),
        T.StructField("cosine_sim", T.DoubleType()),
    ]
)


def cosine_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k with the scoring loop as one NumPy matmul per
    (Arrow batch x broadcast query matrix).

    The query set is collected to the driver ONCE and shipped as a broadcast
    variable (it is the small side by contract — same assumption the
    built-in variant makes by broadcasting the query frame). The corpus
    streams through ``mapInPandas`` without ever materializing.
    """
    import numpy as np

    q_rows = queries.select(id_col, emb_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    sc = corpus.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, q_mat))

    def score(batches: Iterator) -> Iterator:
        import pandas as pd

        ids, mat = bq.value
        for pdf in batches:
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_mat = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
            c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
            sims = c_mat @ mat.T  # (batch, n_queries)
            n_b, n_q = sims.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids, n_b),
                    "corpus_id": np.tile(c_ids, n_q),
                    "cosine_sim": sims.T.ravel(),
                }
            )

    scored = (
        corpus.select(id_col, emb_col)
        .mapInPandas(score, FEATURE)
        .where(F.col("query_id") != F.col("corpus_id"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine_sim", "rank")
    )
