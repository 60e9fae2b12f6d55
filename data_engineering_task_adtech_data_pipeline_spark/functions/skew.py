"""Skew-handling: salted two-phase aggregation.

AQE's skew-join splitting covers joins, but a groupBy on a pathological hot
key (one campaign = 30% of 100 TB of events) still funnels that key's rows
into one reduce task. ``salted_agg`` runs the classic two-phase plan:

    phase 1: groupBy(key, salt)  — hot key splits across `salt_buckets` tasks
    phase 2: groupBy(key)        — merges `salt_buckets` partials per key

Only algebraic aggregates decompose this way; the helper takes the partial
and merge expressions explicitly so the decomposition is visible and
testable (count→sum, sum→sum, max→max, min→min).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partials: dict[str, Column],
    merges: dict[str, Column],
    salt_buckets: int = 32,
    salt_cols: Sequence[str] | None = None,
    layout_salt: bool = False,
) -> DataFrame:
    """Two-phase aggregation over ``keys`` with a salt column.

    ``partials``: output-name -> aggregate over raw rows (phase 1).
    ``merges``: output-name -> aggregate over phase-1 partial columns
    (phase 2; reference partial columns by their output names).

    The default salt is a CONTENT hash (xxhash64 over ``salt_cols``,
    default all columns), not ``monotonically_increasing_id``: results
    were already layout-independent (phase 2 re-merges), but a
    partition-layout salt made phase-1 TASK SHAPES irreproducible across
    different input splits, which turns skew debugging into chasing
    ghosts (r8 review). A content hash gives the same row → same bucket
    on every run and every layout — BUT duplicate rows (over
    ``salt_cols``) share a bucket, so a hot key whose rows carry few
    distinct contents (e.g. a projected low-cardinality frame like
    ``(campaign_id, event_type)``) splits across at most
    n-distinct-contents buckets, not ``salt_buckets`` (round-9 review).
    When the frame going in is a narrow projection, either pass
    ``salt_cols`` naming a high-entropy column (an id, a timestamp — the
    PREFERRED fix: deterministic AND splits) or set ``layout_salt=True``
    to salt by ``monotonically_increasing_id`` — that arm ALWAYS splits
    evenly but is row-order-dependent: besides irreproducible phase-1
    task shapes, a mid-shuffle executor loss makes the map stage
    INDETERMINATE (rows re-bucket on re-run). Spark 3+ detects this and
    rolls back / re-runs the dependent stages rather than silently
    merging mismatched attempts (SPARK-25341 indeterminate-stage
    handling; where rollback is impossible the job fails loudly), so
    the failure mode is wasted work or an abort, not a wrong total —
    but only the content-hash arms are replay-deterministic. The split
    is the operator's purpose; prefer an entropy-bearing ``salt_cols``
    first and ``layout_salt=True`` over a degenerate content salt.

    Example (count + max watermark per campaign)::

        salted_agg(events, ["campaign_id"],
            partials={"n": F.count(F.lit(1)), "wm": F.max("created_at")},
            merges={"n": F.sum("n"), "wm": F.max("wm")})
    """
    if layout_salt:
        if salt_cols is not None:
            # r9 ADVICE: the two salt selectors are mutually exclusive —
            # silently dropping the caller's deterministic salt_cols for
            # the row-order-dependent arm hid exactly the reproducibility
            # trade-off this docstring spells out.
            raise ValueError(
                "salt_cols and layout_salt=True are mutually exclusive: "
                "layout_salt ignores salt_cols and salts by row position "
                "(irreproducible task shapes). Pick one."
            )
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    else:
        scols = list(salt_cols) if salt_cols is not None else df.columns
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in scols]), F.lit(salt_buckets)
        )
    salted = df.withColumn(_SALT, salt)
    phase1 = salted.groupBy(*keys, _SALT).agg(
        *[c.alias(name) for name, c in partials.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[c.alias(name) for name, c in merges.items()]
    )


def hot_key_census(
    fact: DataFrame, fact_key: str, hot_threshold: int = 1_000_000
) -> DataFrame:
    """Compute the hot-key set once (keys with > ``hot_threshold`` rows)
    for reuse across several :func:`hot_key_split_join` calls of the same
    fact — pass the (persisted) result as ``hot_keys`` so each join scans
    the fact twice instead of three times."""
    return (
        fact.groupBy(fact_key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > hot_threshold)
        .select(fact_key)
    )


def hot_key_split_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    hot_threshold: int = 1_000_000,
    how: str = "inner",
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """Skew-safe fact⋈dim equi-join via HOT-KEY SPLIT: fact keys whose row
    count exceeds ``hot_threshold`` join through a BROADCAST arm (the hot
    rows never shuffle — the handful of hot dim rows ship to them), the
    long tail through the ordinary shuffle join; the union is exactly the
    plain join (oracle-checked). The manual form of AQE's skew-join
    splitting, for when the skew is known and you want it handled in the
    PLAN (deterministic task shapes, no runtime re-plan dependency) — and
    for ``how="left"`` where AQE's splitter declines outer sides.

    Cost note: without ``hot_keys`` the fact is scanned THREE times
    (census count + semi-join hot arm + anti-join tail arm). Pass a
    precomputed ``hot_keys`` frame (single column named ``fact_key``,
    e.g. from a prior call's census or a maintained stats table) to skip
    the census — then the fact is scanned twice, and repeated joins of
    the same fact pay the census once. When computing it here, the
    census is one partial-agg count over the fact key (map-side combine
    collapses each partition to its distinct keys). Either way the
    broadcast arm is bounded: it carries only dim rows matching hot keys
    (≤ distinct-hot-keys rows, a handful by definition of "hot").

    ``how``: "inner" or "left" (left = fact-preserving; hot fact keys
    missing from dim still surface with NULL dim columns via the
    broadcast-arm left join).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if fact_key == dim_key:
        raise ValueError(
            "fact_key and dim_key must be distinct column names (the "
            "join condition references both sides by name); rename one "
            "side first"
        )
    if hot_keys is not None:
        if hot_keys.columns != [fact_key]:
            raise ValueError(
                f"hot_keys must be a single-column frame named "
                f"{fact_key!r}, got columns {hot_keys.columns}"
            )
        hot = hot_keys
    else:
        hot = hot_key_census(fact, fact_key, hot_threshold)
    cond = F.col(fact_key) == F.col(dim_key)
    # hot arm: fact rows with hot keys x broadcast(dim ⋉ hot keys)
    hot_b = F.broadcast(hot)
    fact_hot = fact.join(hot_b, fact_key, "left_semi")
    dim_hot = dim.join(
        F.broadcast(hot.withColumnRenamed(fact_key, dim_key)),
        dim_key,
        "left_semi",
    )
    arm_hot = fact_hot.join(F.broadcast(dim_hot), cond, how)
    # tail arm: everything else through the ordinary shuffle join
    fact_tail = fact.join(hot_b, fact_key, "left_anti")
    arm_tail = fact_tail.join(dim, cond, how)
    return arm_hot.unionByName(arm_tail)
