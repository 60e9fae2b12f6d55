"""Gold report builders — fully recomputed each cycle, matching the
reference's DROP + CREATE + INSERT...SELECT rebuild
(``dags/track_delta.py:429-537, 539-606``).

``as_of`` is an injectable clock (SURVEY.md §4.3-6): the reference calls
``today()``/``now()`` mid-query (``initial_load_generate_postgres_data.py:453-461``),
which makes results untestable; callers pass a fixed date in tests and
``None`` (→ current date) in production.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.compat import ch_left_join, safe_div


def _as_of_col(as_of: str | None) -> Column:
    return F.lit(as_of).cast("date") if as_of else F.current_date()


def totals_report(advertiser_campaigns: DataFrame, as_of: str | None = None) -> DataFrame:
    """24-col KPI report (``initial_load_generate_postgres_data.py:426-492``;
    delta twin ``track_delta.py:471-537``).

    Inherits the silver table's columns and derives: budget arithmetic
    (FLOOR/ROUND), three CASE classifiers, day-count datediffs, CTR and the
    reference's "CPM" (which deliberately lacks the x1000 —
    ``initial_load_generate_postgres_data.py:449``).
    """
    ac = advertiser_campaigns
    as_of_d = _as_of_col(as_of)
    bid = F.col("campaign_bid")
    budget = F.col("campaign_budget")
    clicks = F.col("campaign_clicks_count")
    imps = F.col("campaign_impressions_count")
    spent = F.round(bid * clicks, 2)
    start_d = F.to_date("campaign_start_date")
    end_d = F.to_date("campaign_end_date")

    return ac.select(
        "rtm_advertiser_id",
        "advertiser_name",
        "rtm_campaign_id",
        "campaign_name",
        bid.alias("campaign_bid"),
        budget.alias("campaign_budget"),
        start_d.alias("campaign_start_date"),
        end_d.alias("campaign_end_date"),
        imps.alias("campaign_impressions_count"),
        F.col("campaign_last_impression_at"),
        clicks.alias("campaign_clicks_count"),
        F.col("campaign_last_click_at"),
        # budget KPIs — initial_load_generate_postgres_data.py:433-445
        F.floor(budget / bid).cast("bigint").alias("budget_bids_amount"),
        spent.alias("budget_spent"),
        F.round(budget - bid * clicks, 2).alias("budget_left"),
        F.when(spent > budget, "exceeded")
        .when(clicks == 0, "unused")
        .when(spent < budget, "unspent")
        .otherwise(F.lit(None).cast("string"))
        .alias("budget_status"),
        # performance KPIs — :448-449
        safe_div(clicks.cast("double"), imps.cast("double")).alias("campaign_ctr"),
        safe_div(bid * clicks, imps.cast("double")).alias("campaign_cpm"),
        # period KPIs — :452-461
        F.datediff(end_d, start_d).alias("campaign_period_days"),
        F.datediff(as_of_d, start_d).alias("campaign_days_passed"),
        F.when(end_d < as_of_d, "ended")
        .when(start_d > as_of_d, "pending")
        .otherwise("ongoing")
        .alias("period_status"),
        F.when(
            F.datediff(end_d, start_d) > 0,
            F.round(budget / F.datediff(end_d, start_d), 2),
        ).alias("budget_daily_norm"),
        F.when(
            (F.datediff(as_of_d, start_d) > 0)
            & (safe_div(spent, F.datediff(as_of_d, start_d).cast("double"))
               > safe_div(budget, F.datediff(end_d, start_d).cast("double"))),
            "above_norm",
        )
        .when(F.datediff(as_of_d, start_d) > 0, "below_norm")
        .otherwise(F.lit(None).cast("string"))
        .alias("budget_daily_status"),
        as_of_d.alias("report_date"),
    )


def daily_ctr_report(
    advertiser_campaigns: DataFrame,
    impressions_daily: DataFrame,
    clicks_daily: DataFrame,
) -> DataFrame:
    """9-col daily CTR report (``initial_load_generate_postgres_data.py:520-559``;
    rebuilt at ``track_delta.py:548-606``).

    - DISTINCT name projection from the totals table (P3),
    - impressions_daily ⟕ names ⟕ clicks_daily with ClickHouse zero-fill
      (J5 — missing click-days count 0, CTR 0.0, SURVEY.md §4.3-1),
    - ``campaign_day`` = row_number over days *with impressions* (W1 —
      ordinal, not calendar offset).
    """
    names = advertiser_campaigns.select(
        "rtm_advertiser_id", "rtm_campaign_id", "advertiser_name", "campaign_name"
    ).distinct()

    imp = impressions_daily.select(
        "rtm_advertiser_id",
        "rtm_campaign_id",
        F.col("event_date").alias("campaign_impressions_date"),
        F.col("event_count").alias("campaign_impressions_count_daily"),
    )
    clk = clicks_daily.select(
        "rtm_advertiser_id",
        "rtm_campaign_id",
        F.col("event_date").alias("campaign_impressions_date"),
        F.col("event_count").alias("campaign_clicks_count_daily"),
    )
    joined = ch_left_join(
        imp,
        clk,
        on=["rtm_advertiser_id", "rtm_campaign_id", "campaign_impressions_date"],
    )
    joined = ch_left_join(
        joined,
        names,
        on=["rtm_advertiser_id", "rtm_campaign_id"],
        broadcast_right=True,
    )
    day_w = W.partitionBy("rtm_advertiser_id", "rtm_campaign_id").orderBy(
        F.col("campaign_impressions_date").asc()
    )
    imps_d = F.col("campaign_impressions_count_daily")
    clks_d = F.col("campaign_clicks_count_daily")
    return joined.select(
        "rtm_advertiser_id",
        "advertiser_name",
        "rtm_campaign_id",
        "campaign_name",
        "campaign_impressions_date",
        imps_d,
        clks_d,
        F.round(
            F.coalesce(
                safe_div(clks_d.cast("double"), imps_d.cast("double")) * 100,
                F.lit(0.0),
            ),
            2,
        ).alias("campaign_ctr_daily"),
        F.row_number().over(day_w).alias("campaign_day"),
    )
