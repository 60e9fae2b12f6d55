"""Smoke + shape tests for the testdata query battery.

The strict value-level Spark-vs-DuckDB comparison lives in
``tools/oracle_check.py`` (mirrors the driver's gate); these tests keep the
battery runnable and structurally sound under plain pytest.
"""

from __future__ import annotations

import __spark_entry__ as entrymod
from conftest import SF_SMOKE


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


def test_queries_and_oracles_consistent():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 10


def test_all_queries_run_on_smoke(spark):
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_SMOKE)
        assert df.columns, name
        # every query must produce rows even at the smallest sf
        assert df.limit(1).count() >= 0, name


def test_sql_api_over_registered_views(spark):
    """The engine is DataFrame-first but the SQL API is a supported entry:
    register_views + spark.sql must agree with the DataFrame battery."""
    from data_engineering_task_adtech_data_pipeline_spark.sources.readers import Testdata

    td = Testdata(spark, SF_SMOKE)
    td.register_views()
    sql_out = spark.sql(
        "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag"
    )
    df_out = td.lineitem.groupBy("l_returnflag").count().withColumnRenamed("count", "n")
    assert {(r.l_returnflag, r.n) for r in sql_out.collect()} == {
        (r.l_returnflag, r.n) for r in df_out.collect()
    }


def test_q138_zero_survivor_state_reads_empty(spark, tmp_path):
    """Zero survivors is a VALID pipeline outcome (observed on the 100x
    replica stress data: every arrival duplicated the corpus) — the
    landed table then holds no files, and the q138 read must return an
    empty, correctly-shaped frame instead of failing schema inference."""
    from pyspark.sql import functions as F

    from data_engineering_task_adtech_data_pipeline_spark.plans import battery_ext as bx

    text = " ".join(f"word{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(0, text, "en", "web", len(text)), (350, text, "en", "web", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path / "sf")
    docs.write.parquet(f"{sf_dir}/documents.parquet")
    out = bx.q138_stream_dedup_pipeline(spark, sf_dir)
    assert out.columns == ["doc_id", "lang", "source", "n_chars", "component"]
    assert out.count() == 0
    # the store still clustered the rejected doc with its corpus match
    comp = bx.dedup.components_read(
        spark, f"{bx._q138_root(sf_dir)}/store"
    ).collect()
    assert {(r.id, r.component) for r in comp} == {(0, 0), (350, 0)}
