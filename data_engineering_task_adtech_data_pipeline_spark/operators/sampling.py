"""Deterministic sampling and splitting — reproducibility primitives for
training-data pipelines.

``df.sample()`` is seed-stable only for a fixed partitioning; repartition the
input and the sample changes. These operators derive membership from a
content/key hash instead, so results are a pure function of the DATA:
stable across partitionings, cluster sizes, Spark versions, and re-runs,
and they compose (the same row lands in the same split everywhere).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def _hash_bucket(keys: Sequence[str | Column], salt: int) -> Column:
    cols = [F.col(c) if isinstance(c, str) else c for c in keys]
    return F.pmod(F.xxhash64(*cols, F.lit(salt)), _BUCKETS)


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    keys: Sequence[str],
    salt: int = 42,
) -> DataFrame:
    """Keep rows whose key-hash falls under ``fraction`` of the bucket
    space. Same (keys, salt) → same sample, on any cluster."""
    return df.where(_hash_bucket(keys, salt) < int(fraction * _BUCKETS))


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    keys: Sequence[str],
    salt: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split: adds ``split_col`` with the split
    name per row. Weights are normalized; splits are disjoint and exhaustive.
    Keying on a stable id (or content hash) guarantees a document never
    leaks between train and eval across pipeline re-runs."""
    total = sum(weights.values())
    bucket = _hash_bucket(keys, salt)
    expr: Column | None = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = bucket < int(acc * _BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[0]) if expr is None else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn(split_col, expr)


def stratified_deterministic_sample(
    df: DataFrame,
    fractions: dict[str, float],
    stratum_col: str,
    keys: Sequence[str],
    salt: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample 'en' to 10% but
    keep all 'zh'); strata missing from ``fractions`` are dropped."""
    bucket = _hash_bucket(keys, salt)
    cond = F.lit(False)
    for stratum, frac in fractions.items():
        cond = cond | (
            (F.col(stratum_col) == stratum) & (bucket < int(frac * _BUCKETS))
        )
    return df.where(cond)
