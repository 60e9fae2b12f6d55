"""Catalog/DDL surface — the reference's idempotent schema bootstrap and
rebuild statements (S6/S7/S9 in SURVEY.md §2.1) expressed against the Spark
catalog:

- ``CREATE DATABASE/TABLE IF NOT EXISTS`` bootstrap
  (``dags/initial_load_generate_postgres_data.py:57-135``)
- ``DROP TABLE IF EXISTS`` + rebuild for gold reports
  (``dags/track_delta.py:438, 548``)
- FK-order reset/truncate (``scripts/main.py:126-139``)

Tables are external parquet locations so the medallion paths in
``plans.pipeline`` and SQL-API users see the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def ensure_database(spark: SparkSession, name: str) -> None:
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def register_parquet_table(
    spark: SparkSession, name: str, path: str, database: str = "default"
) -> None:
    """Idempotent external-table registration (CREATE TABLE IF NOT EXISTS
    ... USING PARQUET LOCATION): schema comes from the files."""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {database}.{name} "
        f"USING PARQUET LOCATION '{path}'"
    )


def rebuild_table(
    spark: SparkSession, name: str, df: DataFrame, database: str = "default"
) -> None:
    """The reference's DROP + CREATE + INSERT...SELECT report rebuild as one
    atomic replace."""
    df.write.mode("overwrite").saveAsTable(f"{database}.{name}")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    path: str | None = None,
    database: str = "default",
) -> None:
    """Bucketed (hash-partitioned-on-disk) table write: every reader joining
    or aggregating on ``key`` with a matching bucket count skips the shuffle
    entirely — the join/agg exchange disappears from the plan (asserted in
    tests/test_plans.py). This is the at-rest co-location strategy for the
    silver campaign tables at 100 TB: pay the hash partitioning once at
    write, delete it from every downstream cycle.

    Catalog note: bucketing metadata lives in the table catalog (not the
    parquet files), so this needs ``saveAsTable``; with Spark's default
    in-memory catalog the registration is session-scoped while the files
    (``path``) persist — a cluster deployment pins them with a Hive/Iceberg
    metastore."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key).sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(f"{database}.{table}")


def hive_metastore_builder(
    warehouse_dir: str,
    metastore_dir: str,
    master: str = "local[4]",
):
    """SparkSession builder pinned to a PERSISTENT Derby-backed Hive
    metastore — the missing half of ``write_bucketed``'s story: bucketing
    metadata lives in the catalog, so with the default in-memory catalog
    it dies with the session even though the files survive. A session
    built here registers tables in ``metastore_dir``; a LATER session
    pointed at the same two dirs sees the same tables WITH their bucket
    spec, so the zero-Exchange bucketed join works across restarts
    (proven in tests/test_catalog_cli.py with two separate processes).

    On a cluster the same two settings point at the shared metastore
    service (Hive/Glue) and an object-store warehouse path; Derby is the
    single-node stand-in Spark ships with (one writer at a time — Derby
    embedded locks the db directory)."""
    return (
        SparkSession.builder.master(master)
        .config("spark.sql.warehouse.dir", warehouse_dir)
        .config(
            "spark.hadoop.javax.jdo.option.ConnectionURL",
            f"jdbc:derby:;databaseName={metastore_dir};create=true",
        )
        .config("spark.ui.enabled", "false")
        .enableHiveSupport()
    )


def drop_table(spark: SparkSession, name: str, database: str = "default") -> None:
    spark.sql(f"DROP TABLE IF EXISTS {database}.{name}")


def truncate_tables(spark: SparkSession, names: list[str], database: str = "default") -> None:
    """FK-safe ordered reset (children first), mirroring
    ``scripts/main.py:133-139``."""
    for name in names:
        spark.sql(f"TRUNCATE TABLE {database}.{name}")
