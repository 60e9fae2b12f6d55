"""Sources: parquet readers (primary) and an optional JDBC path.

Replaces the reference's cursor-based scans (S1,
``dags/initial_load_generate_postgres_data.py:139-148``) with lazy DataFrame
scans: no fetchall, no driver materialization — Catalyst pushes filters and
column pruning into the parquet footer/row-group level.

At 100 TB the same reader works unchanged: parquet directories partitioned by
date are partition-pruned via the `event_date` filter, and
``spark.sql.files.maxPartitionBytes`` (default 128 MB) bounds per-task input.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from .. import fs

from ..schemas import TESTDATA_TABLES


def _ltz_normalize(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ columns to TimestampType (LTZ). The driver's
    parquet vintage determines which logical type arrives; the engine's
    public schemas declare TimestampType throughout, and with the session
    timezone pinned to UTC (session.py) the cast is value-preserving."""
    ntz = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, TimestampNTZType)
    ]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


# ---------------------------------------------------------------------------
# Scan-parallelism floor (optimization round 14, guide §2.5/§6).
#
# A parquet scan's task count is bounded by its SPLIT count — and a table
# written as a handful of single-row-group files caps every downstream
# operator in the same stage at that parallelism, no matter how many cores
# the cluster has. For compute-heavy per-row pipelines (shingling + 64-way
# minhash, regex text features, 13-gram hashing) that serializes the whole
# battery stage on 1-3 tasks (measured: q17 ran 2 tasks, q60's gram stage
# 1-2 tasks at sf0.1 — 2-2.6x wall once spread).
#
# The floor is SCALE-ADAPTIVE, never a local constant: it fires only when
# the scan provably cannot fill the cores (estimated split count below
# half of ``defaultParallelism``) and the table is big enough for an extra
# exchange of it to be worth anything (>= 1 MiB). At 100 TB every real
# table exceeds the split-count condition, so no production scan ever pays
# the shuffle; on the driver's reduced-core bench runs the floor shrinks
# with ``defaultParallelism`` automatically.
#
# Only the COMPUTE-BOUND tables are fanned (documents, embeddings — text
# regex/shingle/hash pipelines and vector folds do far more work per row
# than they carry bytes). The relational tables (events, lineitem, ...)
# feed I/O-thin scans whose map-side partial aggregation collapses the
# data inside the scan stage; measured interleaved A/B at sf0.1: hash
# fan-out moved q17 3.3->2.7 s, q60 6.0->4.5 s, q13 6.4->5.1 s but q05
# (events anti-join) 0.7->1.6 s — the exchange is pure loss on cheap
# scans, so they are excluded. Hash on the table's unique id (not
# round-robin): uniform spread, no sort-before-repartition pass, and
# deterministic under task retries.
# ---------------------------------------------------------------------------

# compute-bound tables only (see block comment): table -> unique hash key
_FANOUT_KEYS = {"documents": "doc_id", "embeddings": "vec_id"}


def _local_scan_size(path: str) -> "tuple[int, int] | None":
    """(total_bytes, n_files) for a locally statable parquet path; None
    when the path is remote (object store / HDFS) — those deployments are
    cluster-scale, where the floor must come from file splits, not an
    extra shuffle, so the fan-out stays off."""
    p = path
    if p.startswith("file://"):
        p = p[len("file://"):] or "/"
    elif p.startswith("file:"):
        p = p[len("file:"):] or "/"
    elif ":" in p.split("/", 1)[0]:
        return None  # non-file scheme
    if not os.path.exists(p):
        return None
    if os.path.isfile(p):
        return os.path.getsize(p), 1
    total = n = 0
    for root, _dirs, files in os.walk(p):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            total += os.path.getsize(os.path.join(root, f))
            n += 1
    return total, n


def scan_parallelism_floor(
    spark: SparkSession, path: str, df: DataFrame, key_col: str | None
) -> DataFrame:
    """Hash fan-out of a compute-bound small-file scan to
    ``defaultParallelism`` partitions — only when the scan's own split
    count cannot fill the cores (see the block comment above).
    Partitioning-only: emitted rows are identical, so every
    oracle-checked result is unchanged.

    The decision is recomputed per call — no memo (round 15, r14
    ADVICE): a path-keyed cache silently served a stale decision after
    a test harness regenerated the parquet at a different size, and the
    os.walk it saves costs microseconds on the handful-of-files layouts
    the floor can fire on (remote schemes return early; huge local
    trees fail the split-count test after a bounded walk)."""
    if key_col is None:
        return df
    cores = spark.sparkContext.defaultParallelism
    info = _local_scan_size(path)
    n = 0
    if info is not None:
        total, files = info
        # maxPartitionBytes-default packing estimate of the split count
        est_tasks = files + total // (128 << 20)
        # 256 KiB floor: embeddings at bench scale is ~0.6 MiB of
        # parquet but 2000 x 64 doubles of fold work per downstream
        # pass — the whitelist already restricts to compute-bound
        # tables, the floor only excludes truly trivial inputs
        if total >= (256 << 10) and est_tasks < max(2, cores // 2):
            n = cores
    return df.repartition(n, F.col(key_col)) if n else df


def read_table(
    spark: SparkSession, sf_dir: str, name: str, scan_floor: bool = True
) -> DataFrame:
    """Read one driver testdata table; schema comes from the parquet footer
    (written by the driver — declared copies live in ``schemas.TESTDATA_SCHEMAS``
    for validation, not for inference). ``scan_floor=False`` skips the
    compute-bound scan-parallelism floor — the ONE read path for every
    table regardless of floor choice (round 15, r14 ADVICE: the opt-out
    used to re-implement the raw read and would have silently diverged
    from any future vintage special-casing added here).

    ``events.ts`` has been written by different driver generations as either
    parquet TIMESTAMP(NANOS) (which Spark's vectorized reader rejects — read
    via the legacy nanos-as-long path and truncate to microseconds, matching
    DuckDB's ns->us cast) or plain TIMESTAMP(MICROS) (read as-is). Detect by
    the column's arrived type so both vintages keep the public schema
    TimestampType.
    """
    path = fs.join(sf_dir, f"{name}.parquet")  # scheme-preserving join
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, LongType):
            # integer `div`, not float `/`: doubles near 1.7e15 have 0.25
            # spacing and could round up across the truncation boundary
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _ltz_normalize(df)
    df = _ltz_normalize(spark.read.parquet(path))
    if not scan_floor:
        return df
    return scan_parallelism_floor(spark, path, df, _FANOUT_KEYS.get(name))


class Testdata:
    """Lazy handle on one scale-factor directory of the shared testdata.

    ``td = Testdata(spark, "/root/testdata/sf0.01"); td.lineitem`` — each
    access returns a fresh lazy DataFrame (no caching side effects).

    ``scan_floor=False`` opts out of the compute-bound scan-parallelism
    floor (see :func:`scan_parallelism_floor`). The multimodal battery
    entries use it: their heavy work happens INSIDE Arrow batches
    (``mapInPandas`` codecs) where per-task Python-worker init dominates
    at small per-partition row counts — measured interleaved at sf0.1,
    the fanned family ran 12.9 s vs 10.2 s unfanned (q129 4.0 vs 2.3),
    the opposite of the JVM-expression pipelines the floor is for
    (guide §4.5: amortize heavyweight init over many batches per task).
    """

    def __init__(
        self, spark: SparkSession, sf_dir: str, scan_floor: bool = True
    ):
        self.spark = spark
        self.sf_dir = sf_dir
        self._scan_floor = scan_floor

    def __getattr__(self, name: str) -> DataFrame:
        if name in TESTDATA_TABLES:
            return read_table(
                self.spark, self.sf_dir, name, scan_floor=self._scan_floor
            )
        raise AttributeError(name)

    def register_views(self) -> None:
        """Register all tables as temp views for the SQL API."""
        for name in TESTDATA_TABLES:
            read_table(self.spark, self.sf_dir, name).createOrReplaceTempView(name)


def read_csv(
    spark: SparkSession,
    path: str,
    schema,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV source with a REQUIRED explicit schema — inference double-scans
    the data and guesses types; this engine never infers (SURVEY.md §1.3)."""
    reader = spark.read.schema(schema).option("header", str(header).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema,
    **options: str,
) -> DataFrame:
    """JSON-lines source with a REQUIRED explicit schema (same no-inference
    policy; corrupt records land in _corrupt_record if included in schema)."""
    reader = spark.read.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def jdbc_scan_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 32,
    lower_bound: "int | None" = None,
    upper_bound: "int | None" = None,
    **options: str,
) -> "dict[str, str]":
    """The exact option map :func:`read_jdbc` hands the JDBC source — a
    PURE function, so the generated reader configuration is contract-
    testable without a live database (round-14, r13 VERDICT #5: the
    production recipe documented on ``read_jdbc`` was prose only; this
    is the code it pins). Invariants the contract test asserts:

    - ``pushDownPredicate``/``pushDownAggregate`` always on;
    - ``fetchsize`` defaults to 10000 (the Postgres driver otherwise
      materializes whole results client-side) but any caller override
      wins;
    - a partitioned scan REQUIRES both bounds — the old silent
      (0, 2^31) defaults produced empty-stripe skew on real ranges;
      callers without bounds use :func:`derive_jdbc_bounds` (what
      ``read_jdbc`` now does itself).
    """
    opts = {
        "url": url,
        "dbtable": table,
        "pushDownPredicate": "true",
        "pushDownAggregate": "true",
        "fetchsize": "10000",
    }
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partitioned JDBC scan needs explicit bounds: derive them "
                "with derive_jdbc_bounds (one MIN/MAX probe) — value-space "
                "defaults stripe a real key range into empty partitions"
            )
        opts.update(
            partitionColumn=partition_column,
            numPartitions=str(num_partitions),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
        )
    opts.update(options)
    return opts


def derive_jdbc_bounds(
    spark: SparkSession,
    url: str,
    table: str,
    column: str,
    **options: str,
) -> "tuple[int, int]":
    """(min, max) of ``table.column`` via ONE single-partition probe query
    pushed to the source DB — the bounds-derivation step of the
    production recipe (the probe scans the PK index, not Spark the
    table). Raises on an empty table (there is nothing to stripe). The
    column is double-quoted (ANSI identifier): Spark's own JDBC writer
    creates quoted lowercase columns, and unquoted names case-fold on
    engines like Derby — quoting matches both that and PG's unquoted
    (lower-cased) DDL."""
    q = f'"{column}"'
    probe = f"(SELECT MIN({q}) AS lo, MAX({q}) AS hi FROM {table}) b"
    reader = spark.read.format("jdbc").option("url", url).option(
        "dbtable", probe
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    row = reader.load().first()
    # positional access: unquoted aliases case-fold differently per engine
    # (Derby returns LO/HI, PG lo/hi)
    if row is None or row[0] is None:
        raise ValueError(f"cannot derive JDBC bounds: {table} is empty")
    return int(row[0]), int(row[1])


def cdc_extract_table(table: str, watermark_col: str, watermark_sql: str) -> str:
    """The subquery-pushdown CDC extract shape from the recipe: a
    ``dbtable`` value (alias ``cdc_extract`` — no leading underscore,
    Derby rejects those) that makes the source DB scan its index for rows
    past the high watermark instead of Spark filtering a full table scan
    (the reference's delta extract, ``dags/track_delta.py:33-40``).
    ``watermark_sql`` is a PREFORMATTED SQL literal in the source's
    dialect (e.g. ``\"TIMESTAMP '2024-01-01 00:00:00'\"``) — this helper
    pins the shape, not a dialect."""
    return (
        f"(SELECT * FROM {table} "
        f"WHERE {watermark_col} > {watermark_sql}) cdc_extract"
    )


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 32,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """JDBC source for a live deployment (the reference reads Postgres via
    PostgresHook, ``dags/track_delta.py:33-40``). Partitioned reads split the
    scan across executors instead of one cursor; aggregate pushdown lets the
    source DB pre-aggregate like the reference's SQL-side CTEs did.

    Production-Postgres recipe (the first thing a real user hits; this
    sandbox has no PG server, so the path is round-tripped through
    embedded Derby in tests — DEVIATIONS.md):

    - **Driver jar**: ship ``org.postgresql:postgresql`` via
      ``spark.jars.packages`` (the JVM needs it; pip psycopg does not
      apply). URL shape ``jdbc:postgresql://host:5432/db``; pass
      ``user``/``password`` through ``**options``.
    - **Partitioned scan**: ``partition_column`` must be numeric, date or
      timestamp (Postgres PKs like the reference's ``impressions.id``
      qualify). Derive real bounds first — one probe query
      ``(lower, upper) = df_or_cursor("SELECT min(id), max(id) ...")`` —
      because the defaults here (0, 2^31) produce empty-stripe skew on
      small ranges. Ranges are uniform in VALUE space, so a sparse or
      hot-ended key skews stripes; prefer a dense sequence column.
    - **fetchsize**: the Postgres driver defaults to streaming the whole
      result unless autocommit is off; set ``fetchsize="10000"`` (an
      ``**options`` passthrough) for cursor-batched reads.
    - **Aggregate pushdown caveat**: Spark pushes a COMPLETE aggregate to
      the source only when ``numPartitions == 1`` or the GROUP BY key
      equals ``partition_column`` — otherwise it pushes partial aggs per
      stripe and finishes the merge itself (still correct, still less
      transfer). Don't expect a 32-stripe read of an unrelated grouping
      to hit PG as one GROUP BY.
    - **Predicate/column pushdown** work per stripe regardless — filters
      land in each stripe's WHERE alongside the range predicate.
    - For the reference's CDC extracts, push the high-watermark filter
      into ``table`` as a subquery alias (:func:`cdc_extract_table`) so
      PG scans the index, not Spark the table.

    The recipe is CODE now, not prose (round 14): the generated option
    map is :func:`jdbc_scan_options` (pure, contract-tested), bounds
    left unset are DERIVED with one MIN/MAX probe
    (:func:`derive_jdbc_bounds`) instead of the old skew-prone
    (0, 2^31) defaults, and fetchsize defaults to 10000.
    """
    if partition_column is not None and (
        lower_bound is None or upper_bound is None
    ):
        lo, hi = derive_jdbc_bounds(
            spark, url, table, partition_column, **options
        )
        lower_bound = lo if lower_bound is None else lower_bound
        upper_bound = hi if upper_bound is None else upper_bound
    reader = spark.read.format("jdbc")
    for k, v in jdbc_scan_options(
        url, table, partition_column, num_partitions,
        lower_bound, upper_bound, **options
    ).items():
        reader = reader.option(k, v)
    return reader.load()


def read_orc(
    spark: SparkSession,
    path: str,
    schema=None,
    **options: str,
) -> DataFrame:
    """ORC source (columnar sibling of parquet, Spark-native — same
    vectorized reader, predicate pushdown and column pruning). Schema is
    optional here because ORC files carry their types like parquet; pass
    one to enforce a contract on untrusted files."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (Spark-native; zlib by default). Exists so a deployment
    standardized on ORC gets the same typed round-trip contract as the
    parquet path."""
    df.write.mode(mode).orc(path)
