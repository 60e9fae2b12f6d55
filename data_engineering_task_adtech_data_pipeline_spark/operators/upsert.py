"""ReplacingMergeTree-style upsert on append-only columnar storage.

The reference's only non-append semantic is ClickHouse
``ENGINE = ReplacingMergeTree(rtm_delta) ORDER BY (keys...)``
(``dags/initial_load_generate_postgres_data.py:97-98``): the storage engine
keeps the max-version row per key at merge time. Spark-on-Parquet has no
native upsert, so we reproduce it the way ClickHouse itself does — append
always wins at write time, dedup at read time:

- **write**: plain ``mode("append")`` parquet writes (no read-modify-write,
  no locking — scales to any ingest rate),
- **read**: ``latest_version`` view — ``row_number() OVER (PARTITION BY keys
  ORDER BY version DESC) = 1``,
- **compact**: periodically rewrite a partition through ``latest_version``
  (the analog of a ClickHouse background merge) so read amplification stays
  bounded.

At 100 TB the dedup window shuffles only the key+version columns it needs;
partition the table by a time column and compact per-partition so each
compaction touches bounded data. On a lakehouse format (Delta/Iceberg) the
same API maps to ``MERGE INTO`` — kept behind this function so callers don't
care.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .. import fs

_RN = "__rn_replacing_merge"


def latest_version(
    df: DataFrame,
    keys: Sequence[str],
    version: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Latest-version-wins dedup view (ReplacingMergeTree read semantics).

    ``tiebreak`` columns break exact version ties deterministically (the
    reference relies on ClickHouse keeping an arbitrary row among equal
    versions; we pin the ordering so results are reproducible).
    """
    order = [F.col(version).desc()] + [F.col(c).desc() for c in tiebreak]
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .where(F.col(_RN) == 1)
        .drop(_RN)
    )


def upsert_append(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
) -> None:
    """Append a batch of versioned rows (the write half of the upsert).

    Mirrors the reference's INSERTs into ReplacingMergeTree
    (``dags/track_delta.py:219-223``): writers never read existing state.
    """
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def compact(
    spark: SparkSession,
    path: str,
    keys: Sequence[str],
    version: str,
    tiebreak: Sequence[str] = (),
) -> None:
    """Rewrite the table keeping only latest versions (background-merge
    analog). Call per time-partition at scale, not on the whole table."""
    deduped = latest_version(spark.read.parquet(path), keys, version, tiebreak)
    tmp = path.rstrip("/") + "__compact_tmp"
    deduped.write.mode("overwrite").parquet(tmp)
    # scheme-agnostic swap via Hadoop FileSystem (atomic on HDFS/local,
    # copy+delete on S3A); on object stores prefer a lakehouse table
    # format where compaction is a metadata swap
    fs.delete(spark, path)
    fs.rename(spark, tmp, path)
