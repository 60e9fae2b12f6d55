"""Declarative data-quality validation — the dbt-test / Great-Expectations
shape: a rule set evaluated in ONE pass over the table, yielding one row
per rule with its violation count. The CI gate a training-data pipeline
runs before promoting a snapshot.

Pure built-in expressions: every row rule compiles to a conditional sum
inside a single aggregation (no per-rule scans), and uniqueness compiles
to count - count(distinct) in the same job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> Column:
    """Violation predicate: value is NULL."""
    return F.col(col).isNull()


def in_range(col: str, lo, hi) -> Column:
    """Violation predicate: value outside [lo, hi] (NULLs pass — compose
    with :func:`not_null` to reject them)."""
    c = F.col(col)
    return c.isNotNull() & ((c < lo) | (c > hi))


def accepted_values(col: str, values: list) -> Column:
    """Violation predicate: value not in the accepted set (NULLs pass)."""
    c = F.col(col)
    return c.isNotNull() & ~c.isin(values)


def matches(col: str, regex: str) -> Column:
    """Violation predicate: value does not match ``regex`` (NULLs pass)."""
    c = F.col(col)
    return c.isNotNull() & ~c.rlike(regex)


def validate(
    df: DataFrame,
    rules: dict[str, Column],
    unique: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Evaluate ``rules`` (rule name -> VIOLATION predicate Column) and
    ``unique`` (rule name -> key column list) over ``df``. Returns
    (rule, violations) — a zero-violations row per passing rule, so the
    gate is ``validate(...).where("violations > 0").isEmpty()``.

    Scale shape: all row rules share ONE aggregation pass (each is a
    conditional sum — map-side combined, no shuffle beyond the single
    global agg of R tiny values); each uniqueness rule adds one
    count-distinct aggregate in the same job. One scan of the table
    regardless of rule count.

    Uniqueness counts ``count(*) - count(DISTINCT keys)``: NULL keys are
    violations too (COUNT(DISTINCT) ignores NULLs in Spark and ANSI SQL
    alike — a NULL is never a unique key; pair with :func:`not_null` to
    report them separately).
    """
    if not rules and not unique:
        raise ValueError("no rules given")
    aggs = [
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(name)
        for name, pred in rules.items()
    ]
    for name, keys in (unique or {}).items():
        aggs.append(
            (
                F.count(F.lit(1))
                - F.countDistinct(*[F.col(k) for k in keys])
            ).cast("long").alias(name)
        )
    wide = df.agg(*aggs)
    names = list(rules) + list(unique or {})
    return wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("rule"), F.col(n).alias("violations")
                    )
                    for n in names
                ]
            )
        ).alias("r")
    ).select("r.rule", "r.violations")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    compare_cols: tuple[str, ...] = ("text",),
    change_col: str = "change",
) -> DataFrame:
    """Dataset version diff: classify every id across two snapshots as
    ``added`` (only in new), ``removed`` (only in old), ``changed``
    (present in both, compared content differs) or ``unchanged`` — the
    release-note / audit step between corpus versions. Content identity
    is md5 over the ``compare_cols`` (joined with an unprintable
    separator), so wide rows compare as one 128-bit value.

    Returns (id_col, change_col). Scale shape: each snapshot collapses
    to (id, hash) map-side, then ONE full-outer shuffle join on the id —
    no content column ever moves; group the output by ``change_col`` for
    the summary card.
    """
    sep = "\x1f"

    def hashed(df: DataFrame, out: str) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.md5(F.concat_ws(sep, *[F.col(c) for c in compare_cols])).alias(
                out
            ),
        )
    o = hashed(old, "__h_old")
    n = hashed(new, "__h_new")
    return o.join(n, id_col, "full_outer").select(
        id_col,
        F.when(F.col("__h_old").isNull(), "added")
        .when(F.col("__h_new").isNull(), "removed")
        .when(F.col("__h_old") != F.col("__h_new"), "changed")
        .otherwise("unchanged")
        .alias(change_col),
    )
