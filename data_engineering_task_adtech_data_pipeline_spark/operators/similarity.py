"""Approximate/exact nearest-neighbor search over embedding columns.

Two tiers (both pure built-in expressions — the dot products run as
``F.zip_with`` + ``F.aggregate`` inside codegen, no Python in the hot path):

- ``brute_force_topk`` — exact cosine top-k; the correctness baseline.
  Cost O(|queries| x |corpus|); fine when queries are broadcastable.
- ``lsh_topk`` — random-hyperplane LSH (Charikar 2002): each vector gets a
  ``planes``-bit signature (sign of dot with pseudo-random ±1 hyperplanes
  derived deterministically from xxhash64, so no driver-side plane matrix and
  any executor regenerates them identically); candidates share a signature
  bucket (multi-probe via band splits), then exact cosine re-ranks. At 100 TB
  the bucket join replaces the cross join: cost O(bucket_size x queries).

An IVF variant would cluster once (KMeans) and probe nearest centroids; LSH
was chosen because it needs no trained state and stays deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<double> columns (cast float
    embeddings to double first: double accumulation is deterministic and
    engine-portable)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def with_double_embedding(df: DataFrame, col: str = "embedding") -> DataFrame:
    return df.withColumn(col, F.col(col).cast("array<double>"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query. Queries are broadcast (the typical
    search shape: small query set against a huge corpus); ranking is
    deterministic — ties broken by corpus id."""
    c = with_double_embedding(corpus, emb_col).select(
        F.col(id_col).alias("corpus_id"), F.col(emb_col).alias("__c_emb")
    )
    q = with_double_embedding(queries, emb_col).select(
        F.col(id_col).alias("query_id"), F.col(emb_col).alias("__q_emb")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "corpus_id",
        cosine(F.col("__q_emb"), F.col("__c_emb")).alias("cosine_sim"),
    ).where(F.col("query_id") != F.col("corpus_id"))
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine_sim", "rank")
    )


def hyperplane_signature(
    emb: Column, planes: int = 16, seed: int = 42
) -> Column:
    """``planes``-bit sign signature. Hyperplane p's weight for dimension i
    is ±1 from xxhash64(p, i, seed) — regenerated identically anywhere, no
    stored model."""
    def bit(p: int) -> Column:
        dot = F.aggregate(
            F.zip_with(
                emb,
                F.transform(
                    F.sequence(F.lit(0), F.size(emb) - 1),
                    lambda i: F.when(
                        F.pmod(F.xxhash64(F.lit(p), i, F.lit(seed)), 2) == 0, 1.0
                    ).otherwise(-1.0),
                ),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(dot >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
            F.lit(0).cast("long")
        )

    return F.aggregate(
        F.array(*[bit(p) for p in range(planes)]),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    planes: int = 16,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: candidates share at least one of ``bands`` signature bands
    (multi-probe), exact cosine re-ranks within candidates. Recall rises with
    bands; cost falls with planes/bands selectivity."""
    width = planes // bands

    def banded(df: DataFrame, role: str) -> DataFrame:
        d = with_double_embedding(df, emb_col)
        d = d.select(
            F.col(id_col).alias(f"{role}_id"),
            F.col(emb_col).alias(f"__{role}_emb"),
            hyperplane_signature(F.col(emb_col), planes, seed).alias("__sig"),
        )
        return d.select(
            f"{role}_id",
            f"__{role}_emb",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_idx"),
                            F.shiftrightunsigned("__sig", b * width)
                            .bitwiseAND(F.lit((1 << width) - 1))
                            .alias("band_val"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("band"),
        ).select(f"{role}_id", f"__{role}_emb", "band.band_idx", "band.band_val")

    c = banded(corpus, "corpus")
    q = banded(queries, "query")
    cand = (
        c.join(q, on=["band_idx", "band_val"])
        .where(F.col("query_id") != F.col("corpus_id"))
        .select("query_id", "corpus_id", "__query_emb", "__corpus_emb")
        .dropDuplicates(["query_id", "corpus_id"])
    )
    scored = cand.select(
        "query_id",
        "corpus_id",
        cosine(F.col("__query_emb"), F.col("__corpus_emb")).alias("cosine_sim"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine_sim", "rank")
    )


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim >= threshold)
    via the LSH bucket join — the embedding-space analog of minhash dedup."""
    d = with_double_embedding(df, emb_col).select(
        F.col(id_col).alias("id"),
        F.col(emb_col).alias("emb"),
        hyperplane_signature(F.col(emb_col), planes, seed).alias("sig"),
    )
    width = planes // bands
    banded = d.select(
        "id",
        "emb",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftrightunsigned("sig", b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("band_val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("id", "emb", "band.band_idx", "band.band_val")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, on=["band_idx", "band_val"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.emb").alias("emb_a"),
            F.col("b.emb").alias("emb_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.select(
            "id_a", "id_b", cosine(F.col("emb_a"), F.col("emb_b")).alias("cosine_sim")
        )
        .where(F.col("cosine_sim") >= threshold)
    )
