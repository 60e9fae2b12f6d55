"""Stats surface — the reference CLI's ``stats`` command
(``scripts/main.py:64-123``) as DataFrame programs: per-table counts plus the
campaign-detail aggregate (campaign ⨝ advertiser ⟕ impressions ⟕ clicks with
exact COUNT(DISTINCT) and CTR)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.compat import safe_div


def table_counts(tables: dict[str, DataFrame]) -> dict[str, int]:
    """Per-table row counts (``scripts/main.py:70-86``)."""
    return {name: df.count() for name, df in tables.items()}


def campaign_stats(
    advertiser: DataFrame,
    campaign: DataFrame,
    impressions: DataFrame,
    clicks: DataFrame,
) -> DataFrame:
    """Campaign detail: names, distinct impression/click counts, CTR —
    ``scripts/main.py:96-111`` (J7/A4). COUNT(DISTINCT id) kept exact as in
    the reference; swap to approx_count_distinct at extreme cardinalities."""
    camp = campaign.select(
        F.col("id").alias("campaign_id"),
        F.col("name").alias("campaign_name"),
        "advertiser_id",
    )
    adv = advertiser.select(
        F.col("id").alias("advertiser_id"), F.col("name").alias("advertiser_name")
    )
    imp = impressions.select(
        F.col("campaign_id"), F.col("id").alias("impression_id")
    )
    clk = clicks.select(F.col("campaign_id"), F.col("id").alias("click_id"))
    joined = (
        camp.join(F.broadcast(adv), "advertiser_id", "inner")
        .join(imp, "campaign_id", "left")
        .join(clk, "campaign_id", "left")
    )
    return (
        joined.groupBy("campaign_id", "campaign_name", "advertiser_name")
        .agg(
            F.countDistinct("impression_id").alias("impressions"),
            F.countDistinct("click_id").alias("clicks"),
        )
        .select(
            "campaign_id",
            "campaign_name",
            "advertiser_name",
            "impressions",
            "clicks",
            F.round(
                safe_div(
                    F.col("clicks").cast("double"),
                    F.col("impressions").cast("double"),
                )
                * 100,
                2,
            ).alias("ctr_pct"),
        )
        .orderBy("campaign_id")
    )
