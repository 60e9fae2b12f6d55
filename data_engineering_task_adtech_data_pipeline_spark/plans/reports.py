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

from ..functions.compat import ch_left_join


def _as_of_col(as_of: str | None) -> Column:
    return F.lit(as_of).cast("date") if as_of else F.current_date()


def totals_report(advertiser_campaigns: DataFrame, as_of: str | None = None) -> DataFrame:
    """24-col KPI report, column- and formula-exact to the reference
    (``initial_load_generate_postgres_data.py:426-492``; DDL ``:395-423``;
    delta twin ``track_delta.py:471-537``).

    Reference semantics reproduced deliberately:
    - ``campaign_cpm`` lacks the x1000 (it is cost-per-impression; ``:449``),
    - division by zero -> NULL via try_divide (ClickHouse Float64 would
      yield inf/nan, but ANSI Spark errors on zero division; DEVIATIONS.md #9),
    - ``campaign_budget_daily_status`` compares the ROUNDED norm/used values
      and is NULL when they are equal (``:443-445``),
    - ``campaign_period_status``: end==as_of -> 'ended', future -> 'ongoing',
      past -> 'exceeded' (``:455-459``),
    - ``today()``/``now()`` become the injectable ``as_of`` (SURVEY §4.3-6).
    """
    ac = advertiser_campaigns
    as_of_d = _as_of_col(as_of)
    bid = F.col("campaign_bid")
    budget = F.col("campaign_budget")
    clicks = F.col("campaign_clicks_count_total")
    imps = F.col("campaign_impressions_count_total")
    used = bid * clicks
    start_d = F.to_date("campaign_start_date")
    end_d = F.to_date("campaign_end_date")
    period_days = F.datediff(end_d, start_d)
    # try_divide: ANSI Spark (4.x default) errors on ANY division by zero;
    # ClickHouse Float64 yields inf/nan. NULL is the idiomatic Spark
    # resolution — DEVIATIONS.md #9
    daily_norm = F.round(F.try_divide(budget, period_days), 2)
    daily_used = F.round(F.try_divide(used, period_days), 2)
    remaining = F.datediff(end_d, as_of_d)

    return ac.select(
        "advertiser_name",
        "campaign_name",
        bid.alias("campaign_bid"),
        F.floor(F.try_divide(budget, bid)).alias("campaign_bids_max"),
        (F.floor(F.try_divide(budget, bid)) - clicks).alias("campaign_bids_remaining"),
        budget.alias("campaign_budget"),
        used.alias("campaign_budget_used"),
        F.when(budget < used, "exceeded")
        .when(used == 0, "unused")
        .when(budget > used, "unspent")
        .otherwise(F.lit(None).cast("string"))
        .alias("campaign_budget_status"),
        daily_norm.alias("campaign_budget_daily_norm"),
        daily_used.alias("campaign_budget_daily_used"),
        F.when(daily_norm > daily_used, "below_norm")
        .when(daily_norm < daily_used, "above_norm")
        .otherwise(F.lit(None).cast("string"))
        .alias("campaign_budget_daily_status"),
        imps.alias("campaign_impressions_count_total"),
        clicks.alias("campaign_clicks_count_total"),
        (F.try_divide(clicks.cast("double"), imps.cast("double")) * 100).alias(
            "campaign_ctr"
        ),
        F.try_divide(used, imps.cast("double")).alias("campaign_cpm"),
        start_d.alias("campaign_start_date"),
        end_d.alias("campaign_end_date"),
        period_days.alias("campaign_period_days"),
        F.datediff(as_of_d, start_d).alias("campaign_period_days_elapsed"),
        remaining.alias("campaign_days_remaining"),
        F.when(remaining == 0, "ended")
        .when(remaining > 0, "ongoing")
        .when(remaining < 0, "exceeded")
        .otherwise(F.lit(None).cast("string"))
        .alias("campaign_period_status"),
        "rtm_advertiser_id",
        "rtm_campaign_id",
        (
            F.lit(as_of).cast("timestamp") if as_of else F.current_timestamp()
        ).alias("rtm_timestamp_datetime"),
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
        "campaign_impressions_date",
        "campaign_impressions_count_daily",
    )
    # the reference equi-joins campaign_clicks_date onto
    # campaign_impressions_date (initial_load:543); rename for the join key
    clk = clicks_daily.select(
        "rtm_advertiser_id",
        "rtm_campaign_id",
        F.col("campaign_clicks_date").alias("campaign_impressions_date"),
        "campaign_clicks_count_daily",
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
        "advertiser_name",
        "campaign_name",
        F.row_number().over(day_w).alias("campaign_day"),
        "campaign_impressions_date",
        imps_d,
        clks_d,
        F.round(
            clks_d.cast("double") / imps_d.cast("double") * 100, 2
        ).alias("campaign_ctr_daily"),
        "rtm_advertiser_id",
        "rtm_campaign_id",
    )
