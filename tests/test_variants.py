"""Equivalence tests for alternative implementations: pandas-UDF cosine vs
built-in, salted vs plain aggregation, session_window vs window-composition
sessionization."""

from __future__ import annotations

from conftest import SF_ORACLE
from pyspark.sql import functions as F

from data_engineering_task_adtech_data_pipeline_spark.functions.skew import salted_agg
from data_engineering_task_adtech_data_pipeline_spark.operators import (
    joins,
    similarity,
    similarity_pandas,
)
from data_engineering_task_adtech_data_pipeline_spark.sources.readers import Testdata
from data_engineering_task_adtech_data_pipeline_spark.streaming.jobs import (
    streaming_sessionize,
)


def test_pandas_cosine_matches_builtin(spark):
    emb = Testdata(spark, SF_ORACLE).embeddings
    q = emb.where(F.col("vec_id") < 10)
    a = similarity.brute_force_topk(emb, q, k=5)
    b = similarity_pandas.cosine_topk_pandas(emb, q, k=5)
    # matmul accumulation order differs from the sequential fold -> compare
    # at 9 decimal places, and require identical neighbor sets/ranks
    sa = {(r.query_id, r.corpus_id, r.rank, round(r.cosine_sim, 9)) for r in a.collect()}
    sb = {(r.query_id, r.corpus_id, r.rank, round(r.cosine_sim, 9)) for r in b.collect()}
    assert sa == sb


def test_salted_agg_matches_plain(spark):
    ev = Testdata(spark, SF_ORACLE).events
    plain = {
        r.event_type: (r.n, r.wm)
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.max("ts").alias("wm"))
        .collect()
    }
    salted = {
        r.event_type: (r.n, r.wm)
        for r in salted_agg(
            ev,
            ["event_type"],
            partials={"n": F.count(F.lit(1)), "wm": F.max("ts")},
            merges={"n": F.sum("n").cast("long"), "wm": F.max("wm")},
            salt_buckets=16,
        ).collect()
    }
    assert plain == salted


def test_session_window_matches_composition(spark):
    ev = Testdata(spark, SF_ORACLE).events
    composed = joins.sessionize(ev, key=["user_id"], ts_col="ts", gap_seconds=1800)
    built_in = streaming_sessionize(
        ev.select(F.col("user_id").alias("campaign_id"), F.col("ts").alias("created_at")),
        gap="30 minutes",
    )
    # session_window's end = last_event + gap; compare count + start/key sets
    a = {(r.user_id, r.session_start, r.n_events) for r in composed.collect()}
    b = {(r.campaign_id, r.session_start, r.n_events) for r in built_in.collect()}
    assert a == b
