"""Deterministic sampling/splitting invariants."""

from __future__ import annotations

from conftest import SF_ORACLE
from pyspark.sql import functions as F

from data_engineering_task_adtech_data_pipeline_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    stratified_deterministic_sample,
)
from data_engineering_task_adtech_data_pipeline_spark.sources.readers import Testdata


def test_sample_fraction_and_determinism(spark):
    docs = Testdata(spark, SF_ORACLE).documents
    s1 = deterministic_sample(docs, 0.3, keys=["doc_id"])
    n = s1.count()
    assert 0.2 * 500 < n < 0.4 * 500  # ~binomial around 150
    # pure function of the data: repartitioned input -> identical sample
    s2 = deterministic_sample(docs.repartition(17), 0.3, keys=["doc_id"])
    assert {r.doc_id for r in s1.collect()} == {r.doc_id for r in s2.collect()}


def test_hash_split_disjoint_exhaustive(spark):
    docs = Testdata(spark, SF_ORACLE).documents
    split = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1}, keys=["doc_id"])
    counts = {r.split: r.n for r in
              split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 500  # exhaustive
    assert set(counts) == {"train", "val", "test"}  # all splits populated
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # determinism: same doc -> same split on a different partitioning
    s2 = hash_split(docs.repartition(13), {"train": 0.8, "val": 0.1, "test": 0.1},
                    keys=["doc_id"])
    m1 = {r.doc_id: r.split for r in split.collect()}
    m2 = {r.doc_id: r.split for r in s2.collect()}
    assert m1 == m2


def test_stratified_sample(spark):
    docs = Testdata(spark, SF_ORACLE).documents
    out = stratified_deterministic_sample(
        docs, {"en": 0.5, "zh": 1.0}, stratum_col="lang", keys=["doc_id"]
    )
    by_lang = {r.lang: r.n for r in
               out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(by_lang) == {"en", "zh"}  # other strata dropped
    assert by_lang["zh"] == 75  # keep-all stratum complete
    assert 0.3 * 218 < by_lang["en"] < 0.7 * 218


def test_cap_per_group_deterministic_uniform(spark):
    from data_engineering_task_adtech_data_pipeline_spark.operators.sampling import (
        cap_per_group,
    )

    docs = Testdata(spark, SF_ORACLE).documents
    capped = cap_per_group(docs, "source", cap=10, keys=["doc_id"])
    sizes = {r.source: r.n for r in
             capped.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    raw = {r.source: r.n for r in
           docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(n == min(10, raw[s]) for s, n in sizes.items())
    # partition-independent survivors
    again = cap_per_group(docs.repartition(13), "source", cap=10, keys=["doc_id"])
    assert {r.doc_id for r in capped.select("doc_id").collect()} == {
        r.doc_id for r in again.select("doc_id").collect()
    }


def test_repetition_features_flags_boilerplate(spark):
    from data_engineering_task_adtech_data_pipeline_spark.operators.text import (
        repetition_features,
    )

    df = spark.createDataFrame(
        [
            (1, "buy now buy now buy now buy now"),
            (2, "a quiet brown fox crossed seven distinct bridges yesterday"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_features(df).collect()}
    assert out[1].top_token_share == 0.5  # 'buy' 4 of 8
    assert out[1].distinct_token_ratio == 0.25  # 2 of 8
    assert out[2].top_token_share < 0.2
    assert out[2].distinct_token_ratio == 1.0
