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


def zorder_value(
    cols,
    mins,
    maxs,
    bits_per_col: int = 16,
):
    """Z-order (Morton) curve value from numeric columns: each column is
    linearly bucketed to ``bits_per_col`` bits over its [min, max] range,
    then the buckets' bits are interleaved — points close on the curve
    are close in EVERY dimension, which is what makes multi-column
    min/max file skipping work (Morton 1966; the layout behind
    Delta/Iceberg OPTIMIZE ZORDER). Pure built-in bit arithmetic
    (shift/and/or terms), JVM-side.

    ``mins``/``maxs``: per-column global bounds (plain Python numbers —
    one bounded agg collect by the caller; model state, not data)."""
    from pyspark.sql import functions as F

    n = len(cols)
    if not (n == len(mins) == len(maxs)):
        raise ValueError("cols, mins, maxs must align")
    if n < 2:
        raise ValueError("z-ordering needs >= 2 columns")
    # every interleaved bit must land in [0, 63): position 63 is the
    # BIGINT sign bit (a negative z inverts the curve order) and Spark's
    # shiftleft masks the shift amount to 6 bits (positions >= 64 would
    # silently alias onto low bits). Auto-narrow the per-column width —
    # precision costs only intra-bucket ordering, never correctness.
    bits_per_col = min(bits_per_col, 62 // n)
    if bits_per_col < 1:
        raise ValueError(f"too many columns to interleave: {n}")
    top = (1 << bits_per_col) - 1
    buckets = []
    for c, lo, hi in zip(cols, mins, maxs):
        col = F.col(c) if isinstance(c, str) else c
        span = float(hi) - float(lo)
        if span <= 0:  # constant column: every row in bucket 0
            buckets.append(F.lit(0).cast("long"))
            continue
        frac = (col.cast("double") - float(lo)) / F.lit(span)
        b = F.floor(frac * (1 << bits_per_col)).cast("long")
        buckets.append(F.least(F.greatest(b, F.lit(0)), F.lit(top)))
    z = F.lit(0).cast("long")
    for bit in range(bits_per_col):
        for j, b in enumerate(buckets):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, bit).bitwiseAND(F.lit(1)),
                    bit * n + j,
                )
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols,
    n_files: int = 32,
    bits_per_col: int = 16,
) -> None:
    """Write ``df`` as parquet laid out along the Z-order curve of
    ``cols`` — the MULTI-column at-rest clustering strategy
    (``write_bucketed`` co-locates ONE join key; z-ordering makes
    min/max file skipping selective on SEVERAL range/point-filter
    columns at once, the events-table access pattern: by campaign, by
    day, by both).

    Mechanics: one bounded agg collects each column's global min/max
    (model state), every row gets its Morton value, then
    ``repartitionByRange(n_files, z)`` + ``sortWithinPartitions(z)``
    so each output file covers a contiguous curve segment — tight
    per-file min/max envelopes on EVERY z-ordered column (measured in
    tests: per-file spans shrink ~n_files-fold vs an unclustered
    write). Readers need nothing special: parquet row-group/file stats
    do the skipping. At 100 TB this is the difference between scanning
    the whole fact table and scanning the handful of files whose
    envelope intersects the predicate."""
    from pyspark.sql import functions as F

    if not all(isinstance(c, str) for c in cols):
        raise TypeError("cols must be column NAMES (strings)")
    names = list(cols)
    bounds = df.agg(
        *[F.min(c).alias(f"__lo{i}") for i, c in enumerate(names)],
        *[F.max(c).alias(f"__hi{i}") for i, c in enumerate(names)],
    ).first()
    mins = [bounds[f"__lo{i}"] for i in range(len(names))]
    maxs = [bounds[f"__hi{i}"] for i in range(len(names))]
    if any(v is None for v in (*mins, *maxs)):
        bad = [
            names[i]
            for i in range(len(names))
            if mins[i] is None or maxs[i] is None
        ]
        raise ValueError(
            f"cannot z-order {bad}: empty input or all-NULL column(s) "
            "leave no min/max range to bucket"
        )
    z = zorder_value(names, mins, maxs, bits_per_col)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
