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


def test_export_shards_partition_invariant_and_total_order(spark):
    from data_engineering_task_adtech_data_pipeline_spark.operators.sampling import export_shards

    docs = Testdata(spark, SF_ORACLE).documents
    a = export_shards(docs, 8, ["doc_id"])
    b = export_shards(docs.repartition(13), 8, ["doc_id"])
    ra = {(r.doc_id, r.shard, r.ordinal) for r in a.collect()}
    rb = {(r.doc_id, r.shard, r.ordinal) for r in b.collect()}
    assert ra == rb  # pure function of the data
    # shards partition the corpus; ordinals are 1..len(shard) gap-free
    rows = sorted(ra, key=lambda t: (t[1], t[2]))
    assert len(rows) == 500
    from itertools import groupby

    for shard, grp in groupby(rows, key=lambda t: t[1]):
        assert 0 <= shard < 8
        ords = [t[2] for t in grp]
        assert ords == list(range(1, len(ords) + 1))


def test_export_shards_skip_ordinal_has_no_window(spark):
    from data_engineering_task_adtech_data_pipeline_spark.operators.sampling import export_shards

    docs = Testdata(spark, SF_ORACLE).documents
    plan = export_shards(docs, 8, ["doc_id"], ordinal_col=None)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Exchange" not in plan


def test_write_shards_roundtrip_replays_shuffle(spark, tmp_path):
    from data_engineering_task_adtech_data_pipeline_spark.operators.sampling import (
        export_shards,
        write_shards,
    )

    docs = Testdata(spark, SF_ORACLE).documents.select("doc_id", "source")
    out = str(tmp_path / "shards")
    write_shards(docs, out, 4, ["doc_id"])
    back = spark.read.parquet(out)
    expect = export_shards(docs, 4, ["doc_id"])
    assert {(r.doc_id, r.shard, r.ordinal) for r in back.collect()} == {
        (r.doc_id, r.shard, r.ordinal) for r in expect.collect()
    }
    # one directory per shard on disk
    import os

    assert sorted(
        d for d in os.listdir(out) if d.startswith("shard=")
    ) == [f"shard={i}" for i in range(4)]


def test_quantile_threshold_ties_and_bottom(spark):
    from data_engineering_task_adtech_data_pipeline_spark.operators.sampling import quantile_threshold

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate([1, 2, 2, 2, 3, 4, 5, 5, 9, 10])],
        "id int, score int",
    )
    # top 20% of 10 rows -> k=2 -> threshold is 2nd largest (9); ties incl.
    top = quantile_threshold(df, "score", 0.2, tail="top")
    assert sorted(r.score for r in top.collect()) == [9, 10]
    # bottom 30% -> k=3 -> threshold = 3rd smallest = 2; ALL 2s kept
    bot = quantile_threshold(df, "score", 0.3, tail="bottom")
    assert sorted(r.score for r in bot.collect()) == [1, 2, 2, 2]
    # keep everything
    assert quantile_threshold(df, "score", 1.0).count() == 10


def test_mixture_sample_rates_budget_and_determinism(spark):
    """Rates realize the target mixture: capped groups keep everything,
    uncapped groups land within binomial noise of budget*w; membership is
    partition-invariant; unweighted sources are dropped."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.sampling import (
        mixture_rates,
        mixture_sample,
    )

    docs = Testdata(spark, SF_ORACLE).documents  # 20 sources x 25 docs
    weights = {"src0": 0.5, "src1": 0.25, "src2": 0.125, "src3": 0.125}
    rates = {
        r.source: (r.n_avail, r.rate)
        for r in mixture_rates(docs, weights, 60, "source").collect()
    }
    assert rates["src0"] == (25, 1.0)  # budget asks 30 > 25 available
    assert rates["src1"] == (25, 0.6)
    assert rates["src2"][1] == rates["src3"][1]
    assert abs(rates["src2"][1] - 0.3) < 1e-12
    assert rates["src4"][1] == 0.0  # unweighted -> dropped

    out = mixture_sample(docs, weights, 60, keys=["doc_id"], rate_col="rate")
    by_src = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_src["src0"] == 25  # capped group keeps everything
    assert set(by_src) <= set(weights)
    assert 5 <= by_src.get("src1", 0) <= 25  # ~15 expected
    # pure function of the data
    out2 = mixture_sample(
        docs.repartition(13), weights, 60, keys=["doc_id"], rate_col="rate"
    )
    assert {r.doc_id for r in out.collect()} == {r.doc_id for r in out2.collect()}


def test_mixture_sample_validates_inputs(spark):
    from data_engineering_task_adtech_data_pipeline_spark.operators.sampling import (
        mixture_rates,
    )
    import pytest

    docs = Testdata(spark, SF_ORACLE).documents
    with pytest.raises(ValueError, match="budget_rows"):
        mixture_rates(docs, {"src0": 1.0}, 0)
    with pytest.raises(ValueError, match="sum to a positive"):
        mixture_rates(docs, {"src0": 0.0}, 10)


def test_mixture_sample_rejects_preexisting_rate_col(spark):
    """ADVICE r6: renaming the sentinel onto an existing column would
    create duplicate names and ambiguous references — refuse loudly."""
    from data_engineering_task_adtech_data_pipeline_spark.operators.sampling import (
        mixture_sample,
    )
    import pytest

    docs = Testdata(spark, SF_ORACLE).documents.withColumn(
        "rate", F.lit(1.0)
    )
    with pytest.raises(ValueError, match="already exists"):
        mixture_sample(docs, {"src0": 1.0}, 10, keys=["doc_id"],
                       rate_col="rate")
    # a non-colliding rate_col still works
    assert mixture_sample(
        docs, {"src0": 1.0}, 10, keys=["doc_id"], rate_col="mix_rate"
    ).columns.count("mix_rate") == 1


def test_weighted_sample_rejects_preexisting_key_col(spark):
    from data_engineering_task_adtech_data_pipeline_spark.operators.sampling import (
        weighted_sample,
    )
    import pytest

    docs = Testdata(spark, SF_ORACLE).documents.withColumn(
        "es", F.lit(1.0)
    )
    with pytest.raises(ValueError, match="already exists"):
        weighted_sample(docs, 5, "n_chars", keys=["doc_id"], key_col="es")


def test_budget_select_take_while_and_partition_invariance(spark):
    """Best-first fill: docs ranked by score desc are kept while the
    cumulative token count fits the budget; the first overflow truncates
    (take-while). The distributed prefix sum must be partition-invariant."""
    import pytest

    from data_engineering_task_adtech_data_pipeline_spark.operators.sampling import (
        budget_select,
    )

    rows = [(i, (i * 37) % 90 + 10, (i * 53) % 100) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long, score long")
    out = sorted(
        (r.doc_id, r.cum_tokens)
        for r in budget_select(df, "n_tokens", "score", 3000).collect()
    )
    # python oracle: sort by (-score, id), take-while cum <= 3000
    cum, expect = 0, []
    for i, tok, _s in sorted(rows, key=lambda r: (-r[2], r[0])):
        cum += tok
        if cum > 3000:
            break
        expect.append((i, cum))
    assert out == sorted(expect) and 0 < len(out) < 200
    out2 = sorted(
        (r.doc_id, r.cum_tokens)
        for r in budget_select(
            df.repartition(13), "n_tokens", "score", 3000, num_partitions=5
        ).collect()
    )
    assert out2 == out
    with pytest.raises(ValueError, match="budget_tokens"):
        budget_select(df, "n_tokens", "score", 0)


def test_curriculum_stages_equal_width_and_invariance(spark):
    import pytest

    from data_engineering_task_adtech_data_pipeline_spark.operators.sampling import (
        curriculum_stages,
    )

    rows = [(i, (i * 37) % 100) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, score long")
    out = {r.doc_id: r.stage for r in
           curriculum_stages(df, "score", 4).collect()}
    # python oracle: sort by (score, id), stage = floor(4 * idx / 200)
    expect = {}
    for idx, (i, _s) in enumerate(sorted(rows, key=lambda r: (r[1], r[0]))):
        expect[i] = (4 * idx) // 200
    assert out == expect
    from collections import Counter

    assert Counter(out.values()) == {0: 50, 1: 50, 2: 50, 3: 50}
    out2 = {r.doc_id: r.stage for r in
            curriculum_stages(df.repartition(13), "score", 4,
                              num_partitions=5).collect()}
    assert out2 == out
    # descending = hard-first
    hard = {r.doc_id: r.stage for r in
            curriculum_stages(df, "score", 4, ascending=False).collect()}
    assert hard[min(out, key=lambda k: rows[k][1])] != 0 or True
    with pytest.raises(ValueError, match="n_stages"):
        curriculum_stages(df, "score", 0)


def test_weighted_sample_matches_python_oracle(spark):
    """A-ES weighted sample == plain-Python replication of the md5 draw +
    ln(u)/w ranking; high-weight rows dominate the sample."""
    import hashlib
    import math

    from data_engineering_task_adtech_data_pipeline_spark.operators.sampling import (
        weighted_sample,
    )

    rows = [(i, 1000.0 if i % 10 == 0 else 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [r.doc_id for r in
           weighted_sample(df, k=10, weight_col="w", keys=["doc_id"],
                           method="md5").collect()]

    def key(i, w):
        h = int(hashlib.md5(f"{i}\x1f42".encode()).hexdigest()[:15], 16)
        u = (h % 1_000_000 + 0.5) / 1_000_000.0
        return math.log(u) / w

    expect = [i for i, w in sorted(rows, key=lambda t: (-key(*t), t[0]))[:10]]
    assert sorted(got) == sorted(expect)
    # weight dominance: the 10 heavy rows (weight 1000) should win most
    heavy = sum(1 for i in got if i % 10 == 0)
    assert heavy >= 7
