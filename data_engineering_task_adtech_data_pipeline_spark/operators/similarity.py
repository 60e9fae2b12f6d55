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


def _bands_of(sig: Column, planes: int, bands: int) -> Column:
    """array<struct<band_idx,band_val>> splitting a ``planes``-bit signature
    into ``bands`` equal bit-slices (multi-probe LSH banding)."""
    width = planes // bands
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftrightunsigned(sig, b * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("band_val"),
            )
            for b in range(bands)
        ]
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
    max_bucket: int = 1024,
) -> DataFrame:
    """ANN top-k: candidates share at least one of ``bands`` signature bands
    (multi-probe), exact cosine re-ranks within candidates. Recall rises with
    bands; cost falls with planes/bands selectivity.

    Scale shape: only (id, band) rows ride the band shuffle — embeddings are
    joined back BY ID after candidate dedup, so the wide arrays cross the
    wire once per join side instead of ``bands`` times through the explode.
    Corpus buckets are collected sorted and truncated at ``max_bucket``
    (deterministically) so a degenerate band value — e.g. near-zero vectors
    all signing to 0 — cannot make the bucket join quadratic.
    """

    def sig_bands(df: DataFrame, role: str) -> DataFrame:
        d = with_double_embedding(df, emb_col).select(
            F.col(id_col).alias(f"{role}_id"),
            hyperplane_signature(F.col(emb_col), planes, seed).alias("__sig"),
        )
        return d.select(
            f"{role}_id", F.explode(_bands_of(F.col("__sig"), planes, bands)).alias("band")
        ).select(f"{role}_id", "band.band_idx", "band.band_val")

    c_buckets = (
        sig_bands(corpus, "corpus")
        .groupBy("band_idx", "band_val")
        .agg(
            F.slice(F.array_sort(F.collect_set("corpus_id")), 1, max_bucket).alias(
                "members"
            )
        )
    )
    cand = (
        sig_bands(queries, "query")
        .join(c_buckets, on=["band_idx", "band_val"])
        .select("query_id", F.explode("members").alias("corpus_id"))
        .where(F.col("query_id") != F.col("corpus_id"))
        .dropDuplicates(["query_id", "corpus_id"])
    )
    c_emb = with_double_embedding(corpus, emb_col).select(
        F.col(id_col).alias("corpus_id"), F.col(emb_col).alias("__c_emb")
    )
    q_emb = with_double_embedding(queries, emb_col).select(
        F.col(id_col).alias("query_id"), F.col(emb_col).alias("__q_emb")
    )
    scored = (
        cand.join(q_emb, "query_id")
        .join(c_emb, "corpus_id")
        .select(
            "query_id",
            "corpus_id",
            cosine(F.col("__q_emb"), F.col("__c_emb")).alias("cosine_sim"),
        )
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
    max_bucket: int = 256,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim >= threshold)
    via the LSH bucket join — the embedding-space analog of minhash dedup.

    Same scale shape as ``lsh_topk``: id-only band rows, bucket-local (i<j)
    pairing from sorted arrays truncated at ``max_bucket``, embeddings joined
    back by id for the exact cosine verify."""
    d = with_double_embedding(df, emb_col).select(
        F.col(id_col).alias("id"),
        hyperplane_signature(F.col(emb_col), planes, seed).alias("sig"),
    )
    banded = d.select(
        "id", F.explode(_bands_of(F.col("sig"), planes, bands)).alias("band")
    ).select("id", "band.band_idx", "band.band_val")
    buckets = banded.groupBy("band_idx", "band_val").agg(
        F.slice(F.array_sort(F.collect_set("id")), 1, max_bucket).alias("ids")
    )
    pairs = (
        buckets.where(F.size("ids") > 1)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(0), F.size("ids") - 2),
                        lambda i: F.transform(
                            F.slice(F.col("ids"), i + 2, F.size("ids")),
                            lambda j: F.struct(
                                F.col("ids")[i].alias("id_a"), j.alias("id_b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    emb_a = with_double_embedding(df, emb_col).select(
        F.col(id_col).alias("id_a"), F.col(emb_col).alias("__emb_a")
    )
    emb_b = with_double_embedding(df, emb_col).select(
        F.col(id_col).alias("id_b"), F.col(emb_col).alias("__emb_b")
    )
    return (
        pairs.join(emb_a, "id_a")
        .join(emb_b, "id_b")
        .select(
            "id_a",
            "id_b",
            cosine(F.col("__emb_a"), F.col("__emb_b")).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )
