"""Deterministic Spark-native synthetic adtech data.

Mirrors the semantics of the reference's psycopg generators
(``scripts/seed.py:19-106`` — sequential ids, ``chr(64+i)`` advertiser names,
uniform bid/budget, trailing-7-day impression times, click = impression time
+ 1..120 s at a sampled ratio) but generates distributed: ``spark.range`` +
seeded ``F.rand`` columns — no driver-side loops, no INSERT round-trips, so
the same code generates 10^3 or 10^12 rows.

Edge cases required by FIXTURES.md §A are injected deterministically:
- some advertisers with NULL ``updated_at`` (NULL-watermark path,
  ``dags/track_delta.py:13-15``),
- one campaign with ``end_date = start_date`` ('ended' classifier branch) and
  one with a long-past end_date ('exceeded'),
- the last campaign of each advertiser gets no impressions (NULL-count edge),
- clicks only on a subset of impression-days (zero-fill left-join edge).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_DATE = "2024-01-01"  # deterministic 'now' anchor (SURVEY.md §4.3-3/6)


@dataclass(frozen=True)
class GenConfig:
    advertisers: int = 5
    campaigns_per_advertiser: int = 3
    impressions_per_campaign: int = 1000
    ctr: float = 0.08
    seed: int = 42
    id_offset: int = 0  # bump for delta batches so ids stay sequential/unique


def gen_advertisers(spark: SparkSession, cfg: GenConfig) -> DataFrame:
    """``chr(64+i)`` naming per ``scripts/seed.py:25``; every 4th advertiser
    has NULL updated_at to exercise the NULL-watermark branch."""
    base_ts = F.lit(f"{BASE_DATE} 00:00:00").cast("timestamp")
    df = spark.range(1, cfg.advertisers + 1).select(
        (F.col("id") + cfg.id_offset).alias("id"),
        F.concat(
            F.lit("Advertiser "), F.char(F.lit(64) + F.col("id") + cfg.id_offset)
        ).alias("name"),
        F.when(
            (F.col("id") + cfg.id_offset) % 4 == 0, F.lit(None).cast("timestamp")
        )
        .otherwise(F.timestamp_seconds(F.unix_timestamp(base_ts) + F.col("id")))
        .alias("updated_at"),
        F.timestamp_seconds(F.unix_timestamp(base_ts) + F.col("id")).alias(
            "created_at"
        ),
    )
    return df


def gen_campaigns(spark: SparkSession, cfg: GenConfig) -> DataFrame:
    """Uniform bid 0.50-5.00 / budget 50-500 (``scripts/seed.py:48-50``);
    end_date = start + 7..30 d, except campaign 1 (= start, 'ended') and
    campaign 2 (start shifted far past, 'exceeded')."""
    n = cfg.advertisers * cfg.campaigns_per_advertiser
    base_ts = F.lit(f"{BASE_DATE} 00:00:00").cast("timestamp")
    start = F.lit(BASE_DATE).cast("date")
    df = spark.range(1, n + 1).select(
        (F.col("id") + cfg.id_offset).alias("id"),
        ((F.col("id") - 1) % cfg.advertisers + 1 + cfg.id_offset).alias(
            "advertiser_id"
        ),
    )
    df = df.select(
        "id",
        F.concat_ws("_", F.lit("Campaign"), "advertiser_id", "id").alias("name"),
        (F.round(F.rand(cfg.seed) * 4.5 + 0.5, 2)).cast("decimal(10,2)").alias("bid"),
        (F.round(F.rand(cfg.seed + 1) * 450 + 50, 2))
        .cast("decimal(10,2)")
        .alias("budget"),
        F.when(F.col("id") % 7 == 2, F.date_sub(start, 60))
        .otherwise(start)
        .alias("start_date"),
        F.when(F.col("id") % 7 == 1, start)  # ended: end == start
        .when(F.col("id") % 7 == 2, F.date_sub(start, 30))  # exceeded: past
        .otherwise(
            F.date_add(start, (F.rand(cfg.seed + 2) * 23 + 7).cast("int"))
        )
        .alias("end_date"),
        "advertiser_id",
        F.timestamp_seconds(F.unix_timestamp(base_ts) + F.col("id") * 10).alias(
            "updated_at"
        ),
        F.timestamp_seconds(F.unix_timestamp(base_ts) + F.col("id") * 10).alias(
            "created_at"
        ),
    )
    return df


def gen_impressions(spark: SparkSession, cfg: GenConfig) -> DataFrame:
    """Timestamps spread over the 7 days after BASE_DATE
    (``scripts/seed.py:72-76`` spreads over trailing 7 days from now; we
    anchor forward from the deterministic base). The last campaign of each
    advertiser gets zero impressions (NULL-count edge, FIXTURES.md §A)."""
    n_campaigns = cfg.advertisers * cfg.campaigns_per_advertiser
    n = n_campaigns * cfg.impressions_per_campaign
    base_ts = F.lit(f"{BASE_DATE} 00:00:00").cast("timestamp")
    df = spark.range(1, n + 1).select(
        (F.col("id") + cfg.id_offset * 1000).alias("id"),
        ((F.col("id") - 1) % n_campaigns + 1 + cfg.id_offset).alias("campaign_id"),
        F.timestamp_seconds(
            F.unix_timestamp(base_ts)
            + (F.rand(cfg.seed + 3) * 7 * 24 * 3600).cast("long")
        ).alias("created_at"),
    )
    # zero-impression edge: drop campaigns whose id ≡ 0 (mod campaigns/adv)
    return df.where(
        (F.col("campaign_id") - cfg.id_offset) % cfg.campaigns_per_advertiser != 0
    )


def gen_clicks(spark: SparkSession, cfg: GenConfig, impressions: DataFrame) -> DataFrame:
    """Clicks = sampled impressions + 1..120 s (``scripts/seed.py:97-99``).
    Sampling is deterministic on impression id; clicks are also restricted to
    even days so some impression-days have zero clicks (zero-fill edge)."""
    frac_ppm = int(cfg.ctr * 1_000_000)
    sampled = impressions.where(
        F.pmod(F.xxhash64("id", F.lit(cfg.seed)), 1_000_000) < frac_ppm
    ).where(F.dayofmonth("created_at") % 2 == 0)
    return sampled.select(
        F.col("id").alias("id"),
        "campaign_id",
        F.timestamp_seconds(
            F.unix_timestamp("created_at")
            + (F.rand(cfg.seed + 4) * 119 + 1).cast("long")
        ).alias("created_at"),
    )


def gen_all(
    spark: SparkSession, cfg: GenConfig | None = None
) -> dict[str, DataFrame]:
    """The reference's ``main.py batch`` (``scripts/main.py:143-206``) as one
    deterministic distributed generation."""
    cfg = cfg or GenConfig()
    advertisers = gen_advertisers(spark, cfg)
    campaigns = gen_campaigns(spark, cfg)
    impressions = gen_impressions(spark, cfg)
    clicks = gen_clicks(spark, cfg, impressions)
    return {
        "advertiser": advertisers,
        "campaign": campaigns,
        "impressions": impressions,
        "clicks": clicks,
    }
