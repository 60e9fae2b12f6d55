"""Explicit schemas for every table the engine touches. No inference.

Two families:

A. The reference's adtech OLTP/OLAP schemas (``migrations/V1__create_schema.sql:1-30``
   and the ClickHouse DDL at ``dags/initial_load_generate_postgres_data.py:77-120``,
   ``:395-423``, ``:503-517``). Money columns keep ``DecimalType(10, 2)`` at ingest
   (the reference degrades NUMERIC -> Float64 crossing into ClickHouse; we cast to
   double only inside report math so the float semantics match).

B. The driver-shared testdata tables (TESTDATA.md) used by the oracle contract.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# A. Adtech OLTP (bronze) — migrations/V1__create_schema.sql:1-30
# --------------------------------------------------------------------------

ADVERTISER = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("updated_at", T.TimestampType(), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

CAMPAIGN = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("bid", T.DecimalType(10, 2), True),
        T.StructField("budget", T.DecimalType(10, 2), True),
        T.StructField("start_date", T.DateType(), True),
        T.StructField("end_date", T.DateType(), True),
        T.StructField("advertiser_id", T.LongType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

IMPRESSIONS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("campaign_id", T.LongType(), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

CLICKS = IMPRESSIONS  # identical shape — V1__create_schema.sql:26-30

# --------------------------------------------------------------------------
# A'. Adtech OLAP (silver) — dags/initial_load_generate_postgres_data.py:77-120
# ReplacingMergeTree(rtm_delta) ORDER BY (rtm_advertiser_id, rtm_campaign_id[, date])
# reproduced as append-only parquet + latest-version dedup view (operators/upsert.py)
# --------------------------------------------------------------------------

ADVERTISER_CAMPAIGNS = T.StructType(  # DDL :79-98, exact names incl. the
    [  # reference's `rtm_campaign_modified` (no gmt_) quirk
        T.StructField("advertiser_name", T.StringType(), True),
        T.StructField("campaign_name", T.StringType(), True),
        T.StructField("campaign_bid", T.DoubleType(), True),
        T.StructField("campaign_budget", T.DoubleType(), True),
        T.StructField("campaign_impressions_count_total", T.LongType(), True),
        T.StructField("campaign_clicks_count_total", T.LongType(), True),
        T.StructField("campaign_start_date", T.TimestampType(), True),
        T.StructField("campaign_end_date", T.TimestampType(), True),
        T.StructField("rtm_advertiser_id", T.LongType(), False),
        T.StructField("rtm_advertiser_gmt_created", T.TimestampType(), True),
        T.StructField("rtm_advertiser_gmt_modified", T.TimestampType(), True),
        T.StructField("rtm_campaign_id", T.LongType(), False),
        T.StructField("rtm_campaign_gmt_created", T.TimestampType(), True),
        T.StructField("rtm_campaign_modified", T.TimestampType(), True),
        T.StructField("rtm_impressions_gmt_created", T.TimestampType(), True),
        T.StructField("rtm_clicks_gmt_created", T.TimestampType(), True),
        T.StructField("rtm_delta", T.TimestampType(), True),
    ]
)


def advertiser_campaigns_daily(prefix: str) -> T.StructType:
    """Daily twins, DDL :101-120 (prefix = 'impressions' | 'clicks')."""
    return T.StructType(
        [
            T.StructField(f"campaign_{prefix}_count_daily", T.LongType(), True),
            T.StructField(f"campaign_{prefix}_date", T.DateType(), True),
            T.StructField("rtm_advertiser_id", T.LongType(), False),
            T.StructField("rtm_campaign_id", T.LongType(), False),
            T.StructField("rtm_delta", T.TimestampType(), True),
        ]
    )


ADVERTISER_CAMPAIGNS_DAILY = advertiser_campaigns_daily("impressions")

# --------------------------------------------------------------------------
# B. Driver-shared testdata (TESTDATA.md / FIXTURES.md §B)
# --------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)
