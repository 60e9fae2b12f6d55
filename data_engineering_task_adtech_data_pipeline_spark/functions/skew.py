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
) -> DataFrame:
    """Two-phase aggregation over ``keys`` with a salt column.

    ``partials``: output-name -> aggregate over raw rows (phase 1).
    ``merges``: output-name -> aggregate over phase-1 partial columns
    (phase 2; reference partial columns by their output names).

    Example (count + max watermark per campaign)::

        salted_agg(events, ["campaign_id"],
            partials={"n": F.count(F.lit(1)), "wm": F.max("created_at")},
            merges={"n": F.sum("n"), "wm": F.max("wm")})
    """
    salted = df.withColumn(_SALT, F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets)))
    phase1 = salted.groupBy(*keys, _SALT).agg(
        *[c.alias(name) for name, c in partials.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[c.alias(name) for name, c in merges.items()]
    )
