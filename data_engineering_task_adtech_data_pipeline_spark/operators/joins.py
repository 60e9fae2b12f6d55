"""Temporal join operators Spark's DataFrame API lacks as primitives,
built as compositions of existing operators (SURVEY.md §7 custom-operator
policy: composition first, Pandas UDF only if semantics demand it — these
don't).

- ``asof_join``   — for each left row, the latest right row with
  ``right_ts <= left_ts`` per key. Implemented with the union+window trick:
  tag both sides, union, per-key sort by time, carry the last right payload
  forward with ``last(..., ignorenulls=True)``. One shuffle on the key —
  never a per-key loop, never a range cross-join. (Same algorithm Flink/
  kdb-style as-of joins use on sorted streams.)
- ``range_join``  — all (left, right) pairs with |left_ts - right_ts| <=
  tolerance per key, via time-bucketing: each right row is replicated into
  the adjacent buckets it can match, the join is an equi-join on
  (key, bucket), and an exact filter trims the edges. Turns an O(n*m)
  inequality join into an equi-join with 2x replication.
- ``sessionize``  — gap-based session ids (the classic cumulative-sum-of-
  new-session-flags window construction).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_SIDE = "__side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left rows + the most recent right payload at or before their
    timestamp (NULL payload when no prior right row exists).

    Ties (right_ts == left_ts) match, per standard as-of semantics; among
    equal right timestamps the row sorted last by payload wins
    (deterministic because the union sort is pinned: time, side, payload).
    """
    payload = list(right_payload or [c for c in right.columns if c not in on and c != right_ts])
    lcols = left.columns

    l_tagged = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in payload],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(f"__r_{c}") for c in payload],
    ).select(*[F.col(c) for c in lcols], "__t", _SIDE, *[f"__r_{c}" for c in payload])

    unioned = l_tagged.unionByName(r_tagged)
    # right rows sort before left rows at equal timestamps so a tie matches
    w = (
        W.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col(_SIDE).asc(),
                 *[F.col(f"__r_{c}").asc() for c in payload])
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "__t",
        _SIDE,
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in payload
        ],
    )
    return carried.where(F.col(_SIDE) == 1).drop("__t", _SIDE)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    tolerance_seconds: int,
) -> DataFrame:
    """All (left, right) pairs within ``tolerance_seconds`` per key.

    Right rows replicate into bucket-1/bucket/bucket+1 of width = tolerance,
    so every qualifying pair shares an equi-join key; the exact |Δt| filter
    runs post-join. Replication factor is a constant 3 regardless of data
    size — the plan stays a hash join at any scale.
    """
    # Fractional-second exact: cast timestamp -> double epoch (keeps the
    # microsecond part); unix_timestamp would truncate to whole seconds and
    # mis-classify pairs straddling a second boundary at the tolerance edge.
    width = tolerance_seconds
    lb = left.withColumn(
        "__bucket", F.floor(F.col(left_ts).cast("double") / width).cast("long")
    )
    rb = right.withColumn(
        "__bucket0", F.floor(F.col(right_ts).cast("double") / width).cast("long")
    ).select(
        "*",
        F.explode(
            F.array(
                F.col("__bucket0") - 1, F.col("__bucket0"), F.col("__bucket0") + 1
            )
        ).alias("__bucket"),
    ).drop("__bucket0")
    joined = lb.join(rb, on=[*on, "__bucket"])
    dt = F.abs(
        F.col(left_ts).cast("double") - F.col(right_ts).cast("double")
    )
    return joined.where(dt <= tolerance_seconds).drop("__bucket")


def sessionize(
    events: DataFrame,
    key: Sequence[str],
    ts_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    previous event of the same key exceeds ``gap_seconds``. Returns one row
    per session: key cols, session_id (ordinal), session_start/end, n_events.
    """
    w = W.partitionBy(*key).orderBy(F.col(ts_col).asc())
    # double-epoch comparison keeps sub-second precision (unix_timestamp
    # truncates; two events gap_seconds+0.4s apart straddling a second
    # boundary would otherwise land in one session).
    flagged = events.withColumn(
        "__new_session",
        F.when(
            F.col(ts_col).cast("double")
            - F.lag(ts_col).over(w).cast("double")
            > gap_seconds,
            1,
        )
        .otherwise(0)
        .cast("long"),
    ).withColumn(
        "session_id",
        F.sum("__new_session").over(w.rowsBetween(W.unboundedPreceding, 0)) + 1,
    )
    return flagged.groupBy(*key, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
