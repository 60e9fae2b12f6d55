"""Scalar helpers reproducing the reference's engine-specific semantics.

The reference leans on two DB-specific behaviors our Spark plans must
reproduce deliberately (SURVEY.md §4.3):

1. ClickHouse LEFT JOIN default-value fill (``join_use_nulls=0``): non-matching
   numeric columns come back ``0`` (strings ``''``), not NULL — e.g. days with
   impressions but no clicks get ``campaign_clicks_count_daily = 0`` in the
   daily-CTR report (``dags/track_delta.py:588-590``).
2. The ``GREATEST(...)``-of-timestamps high watermark that defines the CDC
   version column ``rtm_delta`` (``dags/track_delta.py:78``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def greatest_watermark(*cols: Column | str) -> Column:
    """NULL-skipping max across columns — the reference's ``rtm_delta``
    high-watermark (``dags/initial_load_generate_postgres_data.py:206``).
    Spark's ``greatest`` matches Postgres: NULLs skipped, all-NULL -> NULL.
    """
    return F.greatest(*[F.col(c) if isinstance(c, str) else c for c in cols])


def ch_left_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    fill: dict[str, object] | None = None,
    broadcast_right: bool = False,
) -> DataFrame:
    """LEFT JOIN with ClickHouse ``join_use_nulls=0`` semantics: columns from
    the right side that did not match are filled with type defaults (0 for
    numerics, '' for strings) instead of NULL.

    ``fill`` overrides per-column defaults; unlisted right columns get their
    type default. ``broadcast_right=True`` hints the dimension-side broadcast
    (the reference's agg sides are tiny relative to facts).
    """
    r = F.broadcast(right) if broadcast_right else right
    joined = left.join(r, on=list(on), how="left")
    fill = fill or {}
    defaults: dict[str, object] = {}
    left_cols = set(left.columns)
    for f in right.schema.fields:
        if f.name in on or f.name in left_cols:
            continue
        if f.name in fill:
            defaults[f.name] = fill[f.name]
        elif f.dataType.typeName() in (
            "integer", "long", "short", "byte", "double", "float", "decimal",
        ):
            defaults[f.name] = 0
        elif f.dataType.typeName() == "string":
            defaults[f.name] = ""
        # timestamps/dates stay NULL: CH fills epoch, but the reference never
        # reads a non-matched timestamp column, so NULL is the safer default
    return joined.fillna(defaults) if defaults else joined


def safe_div(num: Column, den: Column, scale: int | None = None) -> Column:
    """Division guarded against zero denominators.

    ClickHouse float division by 0 yields inf/nan (never errors,
    ``dags/initial_load_generate_postgres_data.py:448-449``); we return NULL
    for a zero/NULL denominator so results stay oracle-comparable, matching
    ANSI ``num / NULLIF(den, 0)``.
    """
    out = num / F.nullif(den, F.lit(0))
    return F.round(out, scale) if scale is not None else out


def exact_money(col: Column | str, scale: int = 2) -> Column:
    """Cast a 2-dp double money column to DecimalType so cross-partition sums
    are exact and engine-independent (double summation order varies between
    runs/engines; decimal sums don't)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")
