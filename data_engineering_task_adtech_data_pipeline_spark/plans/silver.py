"""Silver (OLAP entity) builders — the reference's extract-transform queries.

Reproduces the three ClickHouse entity tables as DataFrame programs, with
column names exactly matching the reference DDL (including its
``rtm_campaign_modified`` — no ``gmt_`` — quirk):

- ``advertiser_campaigns`` (17-col denormalized totals) — extract at
  ``dags/initial_load_generate_postgres_data.py:150-230`` /
  ``dags/track_delta.py:130-216``; DDL ``initial_load...py:79-98``,
- ``advertiser_campaigns_impressions`` / ``_clicks`` (daily grain) —
  ``initial_load_generate_postgres_data.py:239-323``; DDL ``:101-120``.

Plan shape at scale: the event tables are the only big inputs. Their
aggregations reduce to campaign (or campaign×day) grain *before* any join —
partial aggregation map-side, one shuffle each on ``campaign_id`` — then join
against the tiny dimension product (campaign ⟕ advertiser, broadcast). No
shuffle ever moves raw event rows for a join.

Deviation from reference (documented, SURVEY.md §4.3-2): counts are
COALESCE'd to 0 in both the initial and delta paths (the reference zero-fills
only the delta path, leaving NULLs from the initial load).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.compat import greatest_watermark


def _event_totals(events: DataFrame, prefix: str) -> DataFrame:
    """COUNT(*) / MAX(created_at) per campaign (A1,
    ``initial_load_generate_postgres_data.py:169-186``)."""
    return events.groupBy("campaign_id").agg(
        F.count(F.lit(1)).alias(f"campaign_{prefix}_count_total"),
        F.max("created_at").alias(f"rtm_{prefix}_gmt_created"),
    )


def advertiser_campaigns(
    advertiser: DataFrame,
    campaign: DataFrame,
    impressions: DataFrame,
    clicks: DataFrame,
) -> DataFrame:
    """17-col denormalized totals with the GREATEST high-watermark
    ``rtm_delta`` (``initial_load_generate_postgres_data.py:150-230``),
    column names per the DDL at ``:79-98``.

    Joins: campaign ⟕ advertiser on the tiny side (broadcast), then the two
    pre-aggregated event totals (also tiny — campaign grain) broadcast onto it.
    """
    imp_totals = _event_totals(impressions, "impressions")
    clk_totals = _event_totals(clicks, "clicks")

    adv = advertiser.select(
        F.col("id").alias("__adv_id"),
        F.col("name").alias("advertiser_name"),
        F.col("created_at").alias("rtm_advertiser_gmt_created"),
        F.col("updated_at").alias("rtm_advertiser_gmt_modified"),
    )
    camp = campaign.select(
        F.col("id").alias("rtm_campaign_id"),
        F.col("name").alias("campaign_name"),
        F.col("bid").cast("double").alias("campaign_bid"),
        F.col("budget").cast("double").alias("campaign_budget"),
        # DATE -> midnight DateTime widening, set_datime_no_tz at
        # initial_load_generate_postgres_data.py:22-24
        F.col("start_date").cast("timestamp").alias("campaign_start_date"),
        F.col("end_date").cast("timestamp").alias("campaign_end_date"),
        F.col("created_at").alias("rtm_campaign_gmt_created"),
        F.col("updated_at").alias("rtm_campaign_modified"),
        F.col("advertiser_id"),
    )
    df = (
        camp.join(F.broadcast(adv), camp.advertiser_id == adv.__adv_id, "left")
        .join(
            F.broadcast(imp_totals),
            camp.rtm_campaign_id == imp_totals.campaign_id,
            "left",
        )
        .drop("campaign_id")
        .join(
            F.broadcast(clk_totals),
            camp.rtm_campaign_id == clk_totals.campaign_id,
            "left",
        )
        .drop("campaign_id")
    )
    return df.select(
        "advertiser_name",
        "campaign_name",
        "campaign_bid",
        "campaign_budget",
        F.coalesce("campaign_impressions_count_total", F.lit(0)).alias(
            "campaign_impressions_count_total"
        ),
        F.coalesce("campaign_clicks_count_total", F.lit(0)).alias(
            "campaign_clicks_count_total"
        ),
        "campaign_start_date",
        "campaign_end_date",
        F.col("advertiser_id").alias("rtm_advertiser_id"),
        "rtm_advertiser_gmt_created",
        "rtm_advertiser_gmt_modified",
        "rtm_campaign_id",
        "rtm_campaign_gmt_created",
        "rtm_campaign_modified",
        "rtm_impressions_gmt_created",
        "rtm_clicks_gmt_created",
        greatest_watermark(
            "rtm_advertiser_gmt_modified",
            "rtm_campaign_modified",
            "rtm_impressions_gmt_created",
            "rtm_clicks_gmt_created",
        ).alias("rtm_delta"),
    )


def events_daily(
    events: DataFrame, campaign: DataFrame, prefix: str = "impressions"
) -> DataFrame:
    """Daily grain: COUNT(*)/MAX per (advertiser, campaign, day) — the
    impressions/clicks twins (``initial_load_generate_postgres_data.py:252-316``),
    column names per the DDL at ``:101-120`` (``prefix`` = 'impressions' or
    'clicks').

    Aggregates events to (campaign, day) first — one shuffle over the fact
    table — then broadcasts the campaign→advertiser mapping onto the
    aggregate. (The reference joins before aggregating; at 100 TB we flip the
    order so the join never touches raw events.)
    """
    camp_map = campaign.select(
        F.col("id").alias("campaign_id"), F.col("advertiser_id")
    )
    daily = events.groupBy(
        "campaign_id", F.to_date("created_at").alias(f"campaign_{prefix}_date")
    ).agg(
        F.count(F.lit(1)).alias(f"campaign_{prefix}_count_daily"),
        F.max("created_at").alias("rtm_delta"),
    )
    return daily.join(F.broadcast(camp_map), "campaign_id", "left").select(
        f"campaign_{prefix}_count_daily",
        f"campaign_{prefix}_date",
        F.col("advertiser_id").alias("rtm_advertiser_id"),
        F.col("campaign_id").alias("rtm_campaign_id"),
        "rtm_delta",
    )
