"""Data profiling — expectation-style column statistics for pipeline
health checks (the grown-up version of the reference's ``stats`` CLI):
one long-format row per column with null/distinct/min/max counts.

Single pass over the data: all per-column aggregates compute in one
hash-agg, then unpivot to long format. Exact counts only, so the output is
oracle-comparable and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_str, max_str) per column.

    min/max stringified so heterogeneous column types share one schema
    (numeric stringification pinned via cast to avoid locale drift).
    """
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            F.min(F.col(c).cast("string")).alias(f"__mn_{c}"),
            F.max(F.col(c).cast("string")).alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nn_{c}").alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_str"),
            F.col(f"__mx_{c}").alias("max_str"),
        )
        for c in cols
    ]
    return one.select(F.explode(F.array(*rows)).alias("s")).select("s.*")
