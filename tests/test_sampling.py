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
