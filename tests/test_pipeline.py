"""End-to-end pipeline tests (SURVEY.md §5.3): initial load, delta no-op,
incremental batch, and the fundamental invariant delta ≡ full recompute."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_task_adtech_data_pipeline_spark.plans.pipeline import (
    DAILY_KEYS,
    TOTALS_KEYS,
    Pipeline,
)
from data_engineering_task_adtech_data_pipeline_spark.sources.generators import (
    GenConfig,
    gen_all,
)

# as_of == generator BASE_DATE so campaigns with end_date == start_date hit
# the reference's exact-equality 'ended' branch (end == today -> 'ended',
# initial_load_generate_postgres_data.py:455-459)
AS_OF = "2024-01-01"


@pytest.fixture(scope="module")
def pipe(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lake"))
    p = Pipeline(spark, root, as_of=AS_OF)
    p.write_bronze(gen_all(spark, GenConfig(advertisers=4,
                                            campaigns_per_advertiser=3,
                                            impressions_per_campaign=200)))
    p.initial_load()
    return p


def test_initial_load_shapes(pipe):
    ac = pipe.silver("advertiser_campaigns")
    assert ac.count() == 12  # 4 advertisers x 3 campaigns
    assert len(ac.columns) == 17
    # zero-impression campaigns exist and are zero-filled, not NULL
    zero = ac.where(F.col("campaign_impressions_count_total") == 0)
    assert zero.count() > 0
    assert zero.where(F.col("campaign_clicks_count_total").isNull()).count() == 0


def test_totals_report_classifiers(pipe):
    rep = pipe.gold("advertiser_campaigns_totals_report")
    assert len(rep.columns) == 24  # exact reference DDL shape (:395-423)
    statuses = {r.campaign_budget_status for r in rep.collect()}
    assert "unused" in statuses  # zero-click campaigns
    periods = {r.campaign_period_status for r in rep.collect()}
    assert {"ended", "ongoing"} <= periods
    assert "exceeded" in periods  # past-end campaign edge from the generator
    # zero-impression campaigns -> NULL ctr via try_divide (DEVIATIONS.md #9)
    zero = rep.where(F.col("campaign_impressions_count_total") == 0)
    assert zero.count() > 0
    assert zero.where(F.col("campaign_ctr").isNotNull()).count() == 0


def test_daily_ctr_zero_fill_and_ordinal(pipe):
    rep = pipe.gold("advertiser_campaigns_daily_ctr_report")
    # ClickHouse zero-fill semantics: no NULL click counts or CTRs
    assert rep.where(F.col("campaign_clicks_count_daily").isNull()).count() == 0
    assert rep.where(F.col("campaign_ctr_daily").isNull()).count() == 0
    # some impression-days genuinely lack clicks (edge from the generator)
    assert rep.where(F.col("campaign_clicks_count_daily") == 0).count() > 0
    # campaign_day is a dense per-campaign ordinal over days-with-impressions
    first_days = (
        rep.groupBy("rtm_advertiser_id", "rtm_campaign_id")
        .agg(F.min("campaign_day").alias("d0"), F.max("campaign_day").alias("dn"),
             F.count(F.lit(1)).alias("n"))
    )
    assert first_days.where(
        (F.col("d0") != 1) | (F.col("dn") != F.col("n"))
    ).count() == 0


def test_delta_second_run_noop(pipe):
    counts = pipe.track_deltas()
    assert all(v == 0 for v in counts.values()), counts


def test_delta_picks_up_new_batch_and_matches_full_recompute(pipe, spark, tmp_path):
    # append a generator tick (the reference's generate_new_data DAG shape)
    batch = gen_all(
        spark,
        GenConfig(advertisers=2, campaigns_per_advertiser=2,
                  impressions_per_campaign=100, ctr=0.12, seed=7, id_offset=100),
    )
    pipe.append_bronze(batch)
    counts = pipe.track_deltas()
    assert counts["advertiser_campaigns"] > 0
    assert counts["advertiser_campaigns_impressions"] > 0

    # invariant: incremental state == full recompute from bronze
    full = Pipeline(spark, str(tmp_path / "full"), as_of=AS_OF)
    for t in ("advertiser", "campaign", "impressions", "clicks"):
        pipe.bronze(t).write.mode("overwrite").parquet(full.paths.bronze(t))
    full.initial_load()

    for table, keys in [
        ("advertiser_campaigns", TOTALS_KEYS),
        ("advertiser_campaigns_impressions", DAILY_KEYS),
        ("advertiser_campaigns_clicks", DAILY_KEYS),
    ]:
        inc = pipe.silver(table)
        ful = full.silver(table)
        assert inc.count() == ful.count(), table
        assert inc.exceptAll(ful).count() == 0, table
        assert ful.exceptAll(inc).count() == 0, table

    # third run: no-op again
    assert all(v == 0 for v in pipe.track_deltas().values())


def test_incremental_gold_matches_full_rebuild(spark, tmp_path):
    """ROADMAP #5: bucket-incremental daily-report maintenance reproduces the
    full rebuild bit-for-bit — including campaign_day ordinals — because the
    report is bucket-closed (every column depends only on same-campaign
    rows). Both modes write ONE canonical table (round-3 VERDICT #3): after
    incremental cycles, readers of the canonical name see fresh data, and a
    later full rebuild of the same silver state agrees row-for-row."""
    import os

    root = str(tmp_path / "lake")
    p = Pipeline(spark, root, as_of=AS_OF)
    p.write_bronze(gen_all(spark, GenConfig(advertisers=3,
                                            campaigns_per_advertiser=2,
                                            impressions_per_campaign=150)))
    p.initial_load()
    # first incremental cycle builds the bucketed layout in full
    p.append_bronze(gen_all(
        spark,
        GenConfig(advertisers=2, campaigns_per_advertiser=2,
                  impressions_per_campaign=80, seed=3, id_offset=40),
    ))
    assert any(p.track_deltas(incremental_gold=True).values())
    # second cycle touches a strict subset of campaigns -> partial rewrite
    p.append_bronze(gen_all(
        spark,
        GenConfig(advertisers=1, campaigns_per_advertiser=1,
                  impressions_per_campaign=60, seed=11, id_offset=200),
    ))
    assert any(p.track_deltas(incremental_gold=True).values())

    canonical = p.paths.gold("advertiser_campaigns_daily_ctr_report")
    # one table name for both modes: no parallel *_bucketed path, canonical
    # is physically bucket-partitioned, public reader strips the column
    assert not os.path.isdir(canonical + "_bucketed")
    assert any(d.startswith("gold_bucket=") for d in os.listdir(canonical))
    got_df = p.gold("advertiser_campaigns_daily_ctr_report")
    assert "gold_bucket" not in got_df.columns
    got = sorted(map(tuple, got_df.collect()))

    p.rebuild_reports()  # reference full rebuild over the same silver state
    want = sorted(map(tuple, p.gold(
        "advertiser_campaigns_daily_ctr_report").collect()))
    assert got == want


def test_incremental_gold_survives_cache_eviction(spark, tmp_path, monkeypatch):
    """Round-3 VERDICT #4: the touched-bucket set must not depend on cached
    `upserts` partitions surviving until after the silver append. Simulate
    total eviction by unpersisting the changed-rows frame at the moment of
    the append; the incremental gold result must still match a full
    rebuild."""
    from data_engineering_task_adtech_data_pipeline_spark.plans import (
        pipeline as pipeline_mod,
    )

    real_append = pipeline_mod.upsert_append

    def evicting_append(df, path, partition_by=None):
        df.unpersist(blocking=True)  # worst case: cache gone at append time
        return real_append(df, path, partition_by=partition_by)

    monkeypatch.setattr(pipeline_mod, "upsert_append", evicting_append)

    root = str(tmp_path / "lake")
    p = Pipeline(spark, root, as_of=AS_OF)
    p.write_bronze(gen_all(spark, GenConfig(advertisers=3,
                                            campaigns_per_advertiser=2,
                                            impressions_per_campaign=120)))
    p.initial_load()
    p.append_bronze(gen_all(
        spark,
        GenConfig(advertisers=2, campaigns_per_advertiser=1,
                  impressions_per_campaign=70, seed=5, id_offset=60),
    ))
    assert any(p.track_deltas(incremental_gold=True).values())
    p.append_bronze(gen_all(
        spark,
        GenConfig(advertisers=1, campaigns_per_advertiser=1,
                  impressions_per_campaign=50, seed=13, id_offset=300),
    ))
    assert any(p.track_deltas(incremental_gold=True).values())

    got = sorted(map(tuple, p.gold(
        "advertiser_campaigns_daily_ctr_report").collect()))
    p.rebuild_reports()
    want = sorted(map(tuple, p.gold(
        "advertiser_campaigns_daily_ctr_report").collect()))
    assert got == want


def test_pipeline_on_uri_scheme_root(spark, tmp_path):
    """The whole lake must work through a URI-scheme root (file://...) —
    the shape of every non-local deployment. Regression for the round-4
    finding class: Pipeline's first-run probes used os.path.isdir, which
    is always False for a URI, so track_deltas would re-run initial_load
    every cycle against an existing lake. One full cycle: initial load,
    no-op delta (all zero counts), incremental delta lands new rows."""
    root = "file://" + str(tmp_path / "lake")
    p = Pipeline(spark, root, as_of=AS_OF)
    cfg = GenConfig(advertisers=3, campaigns_per_advertiser=2,
                    impressions_per_campaign=40, seed=11)
    p.write_bronze(gen_all(spark, cfg))
    p.initial_load()
    assert p.silver("advertiser_campaigns").count() == 6

    # a second cycle with unchanged bronze must be a NO-OP delta, which
    # only happens if the first-run probe SEES the existing URI lake
    counts = p.track_deltas()
    assert set(counts.values()) == {0}, counts

    # grow bronze -> delta must land the new campaigns through the URI root
    cfg2 = GenConfig(advertisers=4, campaigns_per_advertiser=2,
                     impressions_per_campaign=40, seed=11)
    p.write_bronze(gen_all(spark, cfg2))
    counts = p.track_deltas()
    assert counts["advertiser_campaigns"] > 0
    # generator naming shifts with config, so the new lake is a superset
    # in size, not an exact superset of keys — the URI-path property under
    # test is that the delta cycle LANDS rows through the scheme at all
    assert p.silver("advertiser_campaigns").count() >= 8
