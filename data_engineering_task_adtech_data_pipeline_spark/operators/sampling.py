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

# \x1f (ASCII unit separator) keys can't contain by construction
_SEP = "\x1f"


def _hash_bucket(
    keys: Sequence[str | Column], salt: int, method: str = "xxhash64"
) -> Column:
    """Bucket in [0, _BUCKETS) from a key hash.

    ``method="xxhash64"`` (default) is JVM-native and fastest.
    ``method="md5"`` derives the bucket from the first 15 hex digits of
    md5 over the '\\x1f'-joined key strings — engine-portable (any system
    with md5 + hex parsing reproduces it bit-for-bit; e.g. DuckDB:
    ``('0x' || substr(md5(concat_ws(chr(31), k, salt)), 1, 15))::BIGINT %
    1000000``), which is what lets the split be oracle-checked.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in keys]
    if method == "md5":
        s = F.concat_ws(_SEP, *cols, F.lit(str(salt)))
        h = F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
        return F.pmod(h, _BUCKETS)
    if method != "xxhash64":
        raise ValueError(f"unknown hash method: {method!r}")
    return F.pmod(F.xxhash64(*cols, F.lit(salt)), _BUCKETS)


def _cutoff(fraction: float) -> int:
    """Bucket cutoff with round-half-up: float weight normalization must not
    drift a nominal 0.8 to cutoff 799999 (0.8/1.0000000000000002 truncates).
    Keeps cutoffs equal to the nominal round numbers an external oracle
    computes independently."""
    return int(fraction * _BUCKETS + 0.5)


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    keys: Sequence[str],
    salt: int = 42,
    method: str = "xxhash64",
) -> DataFrame:
    """Keep rows whose key-hash falls under ``fraction`` of the bucket
    space. Same (keys, salt) → same sample, on any cluster."""
    return df.where(_hash_bucket(keys, salt, method) < _cutoff(fraction))


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    keys: Sequence[str],
    salt: int = 42,
    split_col: str = "split",
    method: str = "xxhash64",
) -> DataFrame:
    """Deterministic train/val/test split: adds ``split_col`` with the split
    name per row. Weights are normalized; splits are disjoint and exhaustive.
    Keying on a stable id (or content hash) guarantees a document never
    leaks between train and eval across pipeline re-runs."""
    total = sum(weights.values())
    bucket = _hash_bucket(keys, salt, method)
    expr: Column | None = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = bucket < _cutoff(acc)
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
    method: str = "xxhash64",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample 'en' to 10% but
    keep all 'zh'); strata missing from ``fractions`` are dropped."""
    bucket = _hash_bucket(keys, salt, method)
    cond = F.lit(False)
    for stratum, frac in fractions.items():
        cond = cond | (
            (F.col(stratum_col) == stratum) & (bucket < _cutoff(frac))
        )
    return df.where(cond)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    keys: Sequence[str],
    salt: int = 42,
    method: str = "xxhash64",
) -> DataFrame:
    """Per-group row cap — the Common Crawl "domain cap": keep at most
    ``cap`` rows per ``group_col`` value, chosen by deterministic key-hash
    order rather than arrival order, so re-runs, re-partitions and engines
    all pick the same survivors, and the hash order doubles as an unbiased
    within-group shuffle (the cap IS a uniform per-group subsample).

    Scale shape: one window shuffle on ``group_col``; groups (domains,
    sources) number in the millions at corpus scale so partitions stay
    small. Ties in the bucketed hash break on the keys themselves."""
    from pyspark.sql import Window as W

    order = [_hash_bucket(keys, salt, method).asc()] + [
        F.col(k).asc() for k in keys
    ]
    w = W.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= cap)
        .drop("__rn")
    )
