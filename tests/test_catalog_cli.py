"""Catalog DDL surface + CLI parity smoke tests."""

from __future__ import annotations

from data_engineering_task_adtech_data_pipeline_spark import catalog
from data_engineering_task_adtech_data_pipeline_spark.plans.stats import (
    campaign_stats,
    table_counts,
)
from data_engineering_task_adtech_data_pipeline_spark.sources.generators import (
    GenConfig,
    gen_all,
)


def test_catalog_register_and_rebuild(spark, tmp_path):
    df = spark.range(5).toDF("id")
    path = str(tmp_path / "t1")
    df.write.parquet(path)

    catalog.register_parquet_table(spark, "t1_ext", path)
    assert spark.sql("SELECT COUNT(*) c FROM t1_ext").first().c == 5
    # idempotent (IF NOT EXISTS)
    catalog.register_parquet_table(spark, "t1_ext", path)

    catalog.rebuild_table(spark, "t1_managed", spark.range(3).toDF("id"))
    assert spark.table("t1_managed").count() == 3
    catalog.rebuild_table(spark, "t1_managed", spark.range(7).toDF("id"))
    assert spark.table("t1_managed").count() == 7  # overwrite semantics

    catalog.drop_table(spark, "t1_ext")
    catalog.drop_table(spark, "t1_managed")
    catalog.drop_table(spark, "t1_missing")  # IF EXISTS: no error


def test_stats_parity(spark):
    tables = gen_all(spark, GenConfig(advertisers=3, campaigns_per_advertiser=2,
                                      impressions_per_campaign=100))
    counts = table_counts(tables)
    assert counts["advertiser"] == 3 and counts["campaign"] == 6
    stats = campaign_stats(
        tables["advertiser"], tables["campaign"],
        tables["impressions"], tables["clicks"],
    ).collect()
    assert len(stats) == 6
    by_id = {r.campaign_id: r for r in stats}
    # zero-impression campaigns report NULL CTR, not an error (main.py:96-111
    # would emit no row; we keep the campaign with NULL — documented deviation)
    zero = [r for r in stats if r.impressions == 0]
    assert zero and all(r.ctr_pct is None for r in zero)
    assert all(
        r.ctr_pct is None or 0 <= r.ctr_pct <= 100 for r in by_id.values()
    )
