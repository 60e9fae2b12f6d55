"""Battery part 3: relational breadth beyond the reference's inventory —
set ops, pivot, rollup, window frames, top-k, TPC-H-shaped joins, and the
temporal operators (as-of join, range join, sessionization) from
``operators.joins``. Everything oracle-paired; numeric discipline as in
``battery.py`` (decimal-exact sums, deterministic orderings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators.joins import asof_join, range_join, sessionize
from ..sources.readers import Testdata
from .battery import query


def _dec(col, scale: int = 2):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


@query(
    "q22_revenue_filter",
    oracle="""
    SELECT
      CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6-shaped selective filter + global agg (predicate pushdown "
    "showcase: all four filters reach the parquet scan).",
)
def q22_revenue_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = Testdata(spark, sf_dir).lineitem
    f = l.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q23_top_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
    doc="TPC-H Q3-shaped top-k: dim filter -> fact joins -> agg -> "
    "deterministic ORDER BY + LIMIT (decimal revenue, id tie-break).",
)
def q23_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    td = Testdata(spark, sf_dir)
    c = td.customer.where(F.col("c_mktsegment") == "BUILDING")
    return (
        td.orders.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(td.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


# q24_nation_volume RETIRED round 13 (r12 VERDICT #2): the TPC-H Q5 shape
# (region->nation->supplier->lineitem broadcast dim chain + one fact
# rollup) is a strict subset of q128_nation_trade_volume's Q7 shape (TWO
# broadcast dim chains off the same fact scan, same decimal-sum contract);
# its window slot funds q138_stream_dedup_pipeline. Retirement policy:
# COVERAGE.md §"Driver window rotation". The physical-plan assert it
# anchored (broadcast-no-SMJ dim chain) moved to q128 in test_plans.py.


@query(
    "q25_set_ops",
    oracle="""
    WITH buyers AS (SELECT DISTINCT o_custkey AS custkey FROM orders),
         building AS (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         auto AS (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
    SELECT 'building_buyers' AS segment, custkey FROM (SELECT custkey FROM building INTERSECT SELECT custkey FROM buyers)
    UNION ALL
    SELECT 'building_never_bought' AS segment, custkey FROM (SELECT custkey FROM building EXCEPT SELECT custkey FROM buyers)
    UNION ALL
    SELECT 'building_or_auto' AS segment, custkey FROM (SELECT custkey FROM building UNION SELECT custkey FROM auto)
    """,
    doc="Set operations (INTERSECT / EXCEPT / UNION-distinct) over customer "
    "segments (SURVEY.md §2.7 extension surface).",
)
def q25_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    td = Testdata(spark, sf_dir)
    buyers = td.orders.select(F.col("o_custkey").alias("custkey")).distinct()
    seg = lambda s: td.customer.where(F.col("c_mktsegment") == s).select(  # noqa: E731
        F.col("c_custkey").alias("custkey")
    )
    building, auto = seg("BUILDING"), seg("AUTOMOBILE")
    tag = lambda df, t: df.select(F.lit(t).alias("segment"), "custkey")  # noqa: E731
    return (
        tag(building.intersect(buyers), "building_buyers")
        .unionByName(tag(building.exceptAll(buyers), "building_never_bought"))
        .unionByName(tag(building.union(auto).distinct(), "building_or_auto"))
    )


@query(
    "q26_pivot_events",
    oracle="""
    SELECT CAST(ts AS DATE) AS event_date,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
    FROM events
    GROUP BY CAST(ts AS DATE)
    """,
    doc="Pivot (wide daily event-type counts); absent combos zero-filled on "
    "both sides.",
)
def q26_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Testdata(spark, sf_dir).events
    types = ["click", "view", "purchase", "signup", "error"]
    p = (
        ev.groupBy(F.to_date("ts").alias("event_date"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "event_date",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types],
    )


@query(
    "q27_grouping_sets",
    oracle="""
    SELECT event_type,
           CAST(ts AS DATE) AS event_date,
           CAST(extract(hour FROM ts) AS INTEGER) AS h,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY GROUPING SETS (
      (event_type, CAST(ts AS DATE)),
      (event_type, CAST(extract(hour FROM ts) AS INTEGER)),
      (event_type),
      (CAST(extract(hour FROM ts) AS INTEGER)),
      ()
    )
    """,
    doc="GROUPING SETS = union of ROLLUP(type, day) and CUBE(type, hour) "
    "grouping sets (shared (type) and () sets deduplicated), with decimal-"
    "exact value sums — formerly q27 rollup + q47 cube, merged so both "
    "multi-grain aggregation shapes stay covered inside the driver's "
    "50-entry correctness window.",
)
def q27_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Testdata(spark, sf_dir).events
    return (
        ev.select(
            "event_type",
            F.to_date("ts").alias("event_date"),
            F.hour("ts").alias("h"),
            "value",
        )
        .groupingSets(
            [
                ["event_type", "event_date"],
                ["event_type", "h"],
                ["event_type"],
                ["h"],
                [],
            ],
            "event_type",
            "event_date",
            "h",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


@query(
    "q28_window_calendar",
    oracle="""
    SELECT event_id, user_id, ts,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS DOUBLE) AS running_value,
      LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
      LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type,
      CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER) AS event_ordinal,
      CAST(extract(year FROM ts) AS INTEGER) AS y,
      CAST(extract(month FROM ts) AS INTEGER) AS m,
      CAST(extract(day FROM ts) AS INTEGER) AS d,
      CAST(extract(hour FROM ts) AS INTEGER) AS h,
      CAST(extract(minute FROM ts) AS INTEGER) AS mi,
      CAST(CASE WHEN extract(dow FROM ts) = 0 THEN 7
                ELSE extract(dow FROM ts) END AS INTEGER) AS iso_dow,
      CAST(date_trunc('month', ts) AS DATE) AS month_start,
      CAST(date_trunc('week', ts) AS DATE) AS week_start
    FROM events
    """,
    doc="Window frames + calendar features at event grain: running decimal "
    "sum, lag/lead, per-key ordinals (pinned total order: ts then event_id), "
    "plus calendar extraction with ISO day-of-week (Mon=1..Sun=7, bridging "
    "Spark's weekday vs DuckDB's Sunday=0 dow) — formerly q28+q45, merged "
    "at identical grain so the battery fits the driver's 50-entry window.",
)
def q28_window_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Testdata(spark, sf_dir).events
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(_dec("value")).over(run).cast("double").alias("running_value"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.row_number().over(w).cast("int").alias("event_ordinal"),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        (F.weekday("ts").cast("int") + 1).alias("iso_dow"),
        F.date_trunc("month", "ts").cast("date").alias("month_start"),
        F.date_trunc("week", "ts").cast("date").alias("week_start"),
    )


@query(
    "q29_asof_join",
    oracle="""
    WITH signups AS (
      SELECT user_id, ts, MAX(event_id) AS signup_event_id
      FROM events WHERE event_type = 'signup' GROUP BY user_id, ts
    ),
    clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id, c.ts,
           s.ts AS signup_ts_asof, s.signup_event_id AS signup_event_id_asof
    FROM clicks c
    ASOF LEFT JOIN signups s
      ON c.user_id = s.user_id AND s.ts <= c.ts
    """,
    doc="As-of join (latest signup at or before each click, per user) — "
    "union+window composition vs DuckDB's native ASOF JOIN as oracle.",
)
def q29_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Testdata(spark, sf_dir).events
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    signups = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("signup_event_id"))
        .select("user_id", F.col("ts").alias("signup_ts"), "signup_event_id")
    )
    return asof_join(
        clicks,
        signups,
        on=["user_id"],
        left_ts="ts",
        right_ts="signup_ts",
        right_payload=["signup_ts", "signup_event_id"],
    )


@query(
    "q30_range_join",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           CAST(abs(date_diff('second', c.ts, p.ts)) AS BIGINT) AS dt_seconds
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
    JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND abs(epoch(p.ts) - epoch(c.ts)) <= 3600
    """,
    doc="Range join (click-purchase pairs within 1h per user) — bucketed "
    "equi-join composition vs DuckDB inequality join as oracle.",
)
def q30_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Testdata(spark, sf_dir).events
    pick = lambda t, alias: ev.where(F.col("event_type") == t).select(  # noqa: E731
        F.col("event_id").alias(alias), "user_id", F.col("ts").alias(f"{alias}_ts")
    )
    clicks = pick("click", "click_id")
    purchases = pick("purchase", "purchase_id")
    out = range_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="click_id_ts",
        right_ts="purchase_id_ts",
        tolerance_seconds=3600,
    )
    return out.select(
        "click_id",
        "purchase_id",
        "user_id",
        F.abs(
            F.unix_timestamp("purchase_id_ts") - F.unix_timestamp("click_id_ts")
        ).alias("dt_seconds"),
    )


@query(
    "q31_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
        CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800
             THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts,
        CAST(SUM(new_session) OVER (
          PARTITION BY user_id ORDER BY ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) + 1 AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_id
    """,
    doc="Gap-based sessionization (30-min inactivity) via cumulative "
    "new-session flags — one window + one agg, no state loops.",
)
def q31_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Testdata(spark, sf_dir).events
    return sessionize(ev, key=["user_id"], ts_col="ts", gap_seconds=1800)


@query(
    "q32_percentiles",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.9) AS p90,
           quantile_cont(value, 0.99) AS p99,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events GROUP BY event_type
    """,
    doc="Exact interpolated percentiles per group (Spark percentile == "
    "DuckDB quantile_cont on identical doubles — verified bit-exact).",
)
def q32_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Testdata(spark, sf_dir).events
    return ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.expr("percentile(value, 0.99)").alias("p99"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@query(
    "q33_profile",
    oracle="""
    WITH base AS (SELECT COUNT(*) AS n FROM events)
    SELECT 'event_id' AS column, n AS n_rows,
           (SELECT COUNT(*) FROM events WHERE event_id IS NULL) AS n_nulls,
           (SELECT COUNT(DISTINCT event_id) FROM events) AS n_distinct,
           (SELECT MIN(CAST(event_id AS VARCHAR)) FROM events) AS min_str,
           (SELECT MAX(CAST(event_id AS VARCHAR)) FROM events) AS max_str
    FROM base
    UNION ALL
    SELECT 'event_type', n,
           (SELECT COUNT(*) FROM events WHERE event_type IS NULL),
           (SELECT COUNT(DISTINCT event_type) FROM events),
           (SELECT MIN(event_type) FROM events),
           (SELECT MAX(event_type) FROM events)
    FROM base
    UNION ALL
    SELECT 'user_id', n,
           (SELECT COUNT(*) FROM events WHERE user_id IS NULL),
           (SELECT COUNT(DISTINCT user_id) FROM events),
           (SELECT MIN(CAST(user_id AS VARCHAR)) FROM events),
           (SELECT MAX(CAST(user_id AS VARCHAR)) FROM events)
    FROM base
    UNION ALL
    SELECT 'value', n,
           (SELECT COUNT(*) FROM events WHERE value IS NULL),
           (SELECT COUNT(DISTINCT value) FROM events),
           (SELECT MIN(CAST(value AS VARCHAR)) FROM events),
           (SELECT MAX(CAST(value AS VARCHAR)) FROM events)
    FROM base
    """,
    doc="Expectation-style column profile (nulls/distinct/min/max in one "
    "pass, long format) — operators/profile.py.",
)
def q33_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import profile

    ev = Testdata(spark, sf_dir).events
    return profile(ev, ["event_id", "event_type", "user_id", "value"])


@query(
    "q34_json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
           COUNT(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) > 50 THEN 1 END) AS k_over_50
    FROM events
    GROUP BY event_type
    """,
    doc="JSON property extraction + aggregation over the events.props "
    "string column (get_json_object, JVM-side).",
)
def q34_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Testdata(spark, sf_dir).events
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("k_total"),
        F.count(F.when(k > 50, 1)).alias("k_over_50"),
    )


@query(
    "q37_exists_anti",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus, CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
    )
    AND NOT EXISTS (
      SELECT 1 FROM customer c
      WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING'
    )
    """,
    doc="Correlated EXISTS + NOT EXISTS on one probe: orders with a returned "
    "item (left-semi join, TPC-H Q4 shape) from non-BUILDING customers "
    "(left-anti join) — formerly q37+q38, merged so both join strategies "
    "stay covered inside the driver's 50-entry correctness window.",
)
def q37_exists_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    td = Testdata(spark, sf_dir)
    returned = td.lineitem.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    building = td.customer.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("o_custkey")
    )
    return (
        td.orders.join(returned, "o_orderkey", "left_semi")
        .join(building, "o_custkey", "left_anti")
        .select(
            "o_orderkey",
            "o_orderstatus",
            _dec("o_totalprice").cast("double").alias("total_price"),
        )
    )


@query(
    "q39_order_count_distribution",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY n_orders
    """,
    doc="TPC-H Q13 shape: double aggregation (orders-per-customer histogram, "
    "zero-order customers included via left join + COUNT(col)).",
)
def q39_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    td = Testdata(spark, sf_dir)
    customer, orders = td.customer, td.orders
    per_cust = (
        customer.join(orders, orders.o_custkey == customer.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "q44_string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           substr(p_name, 1, 5) AS name_prefix,
           replace(p_name, ' ', '_') AS name_snake,
           length(p_name) AS name_len,
           strpos(p_name, ' ') AS space_pos,
           lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
           concat(p_brand, ':', p_type) AS brand_type,
           levenshtein(p_name, p_type) AS name_type_distance,
           split_part(p_name, ' ', 2) AS second_word
    FROM part
    """,
    doc="String-function surface: case, substr, replace, instr, lpad, "
    "concat, levenshtein, split_part — all JVM built-ins.",
)
def q44_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Testdata(spark, sf_dir).part
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.length("p_name").alias("name_len"),
        F.instr(F.col("p_name"), " ").alias("space_pos"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.levenshtein("p_name", "p_type").alias("name_type_distance"),
        F.split(F.col("p_name"), " ").getItem(1).alias("second_word"),
    )


# q45_calendar_features was merged into q28_window_calendar (same event
# grain; the calendar columns ride the window query's scan — and lost the
# old version's needless self-join) so the battery fits the driver's
# 50-entry correctness recording window.


@query(
    "q46_array_agg",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS event_types,
           CAST(len(list(DISTINCT event_type)) AS INTEGER) AS n_types,
           MIN(ts) AS first_event_at,
           MAX(ts) AS last_event_at
    FROM events
    GROUP BY user_id
    """,
    doc="Array aggregation: sorted distinct-value collection per key "
    "(collect_set -> sort_array), emitted as a canonical ','-joined string "
    "(the driver's pandas hash cannot factorize raw list cells).",
)
def q46_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Testdata(spark, sf_dir).events
    return ev.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias(
            "event_types"
        ),
        F.size(F.collect_set("event_type")).alias("n_types"),
        F.min("ts").alias("first_event_at"),
        F.max("ts").alias("last_event_at"),
    )


# q47_cube_events was merged into q27_grouping_sets (its CUBE(type, hour)
# sets are members of that query's GROUPING SETS) so the battery fits the
# driver's 50-entry correctness recording window.


# ===========================================================================
# q91 — full rank-function family in one pass
# ===========================================================================

@query(
    "q91_window_ranks",
    oracle="""
    WITH j AS (
      SELECT c.c_nationkey AS nation_id, o.o_orderkey, o.o_totalprice
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    )
    SELECT nation_id, o_orderkey,
           CAST(rank() OVER w AS INTEGER) AS rnk,
           CAST(dense_rank() OVER w AS INTEGER) AS drnk,
           percent_rank() OVER w AS prnk,
           cume_dist() OVER w AS cd,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile
    FROM j
    WINDOW w AS (PARTITION BY nation_id
                 ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
    doc="The full rank-function family — rank / dense_rank / "
    "percent_rank / cume_dist / ntile(4) — in ONE window pass per "
    "nation (one shuffle + one sort serves all five; percent_rank and "
    "cume_dist are exact integer ratios, so doubles match bit-for-bit). "
    "Deterministic total order via the (price desc, orderkey) tiebreak.",
)
def q91_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    td = Testdata(spark, sf_dir)
    o, c = td.orders, td.customer
    j = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_nationkey").alias("nation_id"), "o_orderkey", "o_totalprice"
    )
    w = W.partitionBy("nation_id").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return j.select(
        "nation_id",
        "o_orderkey",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


# ===========================================================================
# q92 — SCD Type-2 dimension history from an observation log
# ===========================================================================

@query(
    "q92_scd2_history",
    oracle="""
    WITH src AS (
      SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS ts,
             o_orderstatus
      FROM orders
    ),
    chg AS (
      SELECT *, CASE WHEN lag(o_orderstatus) OVER w
                          IS DISTINCT FROM o_orderstatus
                     THEN 1 ELSE 0 END AS c
      FROM src
      WINDOW w AS (PARTITION BY o_custkey ORDER BY ts, o_orderkey)
    ),
    iv AS (
      SELECT o_custkey, o_orderstatus, ts AS valid_from, o_orderkey
      FROM chg WHERE c = 1
    )
    SELECT o_custkey, o_orderstatus AS status, valid_from,
           lead(valid_from) OVER (PARTITION BY o_custkey
                                  ORDER BY valid_from, o_orderkey)
             AS valid_to
    FROM iv
    """,
    doc="SCD Type-2 dimension build (operators.delta.scd2_history): each "
    "customer's order-status observation log collapses into validity "
    "intervals — change rows via null-safe lag comparison, valid_to via "
    "lead, NULL = current. The full-history twin of the reference's "
    "latest-version-only delta tables (track_delta.py), and exactly the "
    "shape operators.joins.asof_join consumes.",
)
def q92_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.delta import scd2_history

    src = Testdata(spark, sf_dir).orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("ts"),
        "o_orderstatus",
    )
    out = scd2_history(
        src, keys=["o_custkey"], order_col="ts",
        attr_cols=["o_orderstatus"], tiebreak=["o_orderkey"],
    )
    return out.select(
        "o_custkey",
        F.col("o_orderstatus").alias("status"),
        "valid_from",
        "valid_to",
    )


# ===========================================================================
# q95 — correlated aggregate threshold (TPC-H Q17 shape)
# ===========================================================================

@query(
    "q95_small_quantity_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p.p_brand,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0 AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_small
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE CAST(l.l_quantity * 5 AS DECIMAL(18,2)) * pa.cnt < pa.sum_qty
    GROUP BY p.p_brand
    """,
    doc="TPC-H Q17 shape — lineitems below 20% of their part's average "
    "quantity, revenue per brand: the correlated scalar-aggregate "
    "pattern in its decorrelated form (per-part aggregate joined back — "
    "the exact plan Catalyst produces from the correlated SQL). The "
    "threshold compares 5*qty*cnt < decimal-summed qty, so no "
    "order-dependent double average can flip a row near the boundary.",
)
def q95_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    td = Testdata(spark, sf_dir)
    l, p = td.lineitem, td.part
    pa = l.groupBy("l_partkey").agg(
        F.sum(_dec("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    small = (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .join(pa.withColumnRenamed("l_partkey", "__pk"),
              l["l_partkey"] == F.col("__pk"))
        .where(
            _dec(F.col("l_quantity") * 5) * F.col("cnt") < F.col("sum_qty")
        )
    )
    return small.groupBy("p_brand").agg(
        (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
            "avg_yearly"
        ),
        F.count(F.lit(1)).cast("long").alias("n_small"),
    )


# ===========================================================================
# q96 — retention cohort table (first-order month x months-since activity)
# ===========================================================================

@query(
    "q96_retention_cohorts",
    oracle="""
    WITH fo AS (
      SELECT o_custkey, MIN(date_trunc('month', o_orderdate)) AS cohort
      FROM orders GROUP BY 1
    ),
    act AS (
      SELECT DISTINCT o_custkey, date_trunc('month', o_orderdate) AS m
      FROM orders
    )
    SELECT CAST(f.cohort AS DATE) AS cohort_month,
           CAST((CAST(extract(year FROM a.m) AS INTEGER) * 12
                 + CAST(extract(month FROM a.m) AS INTEGER))
                - (CAST(extract(year FROM f.cohort) AS INTEGER) * 12
                   + CAST(extract(month FROM f.cohort) AS INTEGER))
                AS INTEGER) AS months_since,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM fo f JOIN act a USING (o_custkey)
    GROUP BY 1, 2
    """,
    doc="Retention cohort table — the classic warehouse activity matrix: "
    "cohort = each customer's first-order month, one row per (cohort, "
    "months-since) with active-customer counts. Month arithmetic runs as "
    "exact year*12+month integers (no fractional months_between on "
    "either engine). Two aggregations + one equi-join, keys-only rows.",
)
def q96_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Testdata(spark, sf_dir).orders
    mnum = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    fo = o.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", "o_orderdate")).alias("cohort")
    )
    act = o.select(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("m")
    ).distinct()
    return (
        fo.join(act, "o_custkey")
        .groupBy(
            F.col("cohort").cast("date").alias("cohort_month"),
            (mnum(F.col("m")) - mnum(F.col("cohort")))
            .cast("int")
            .alias("months_since"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )


# ===========================================================================
# q97 — strict-order event funnel (view -> click -> purchase per user)
# ===========================================================================

@query(
    "q97_event_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1
    )
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_view_click,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_full_funnel,
           CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM v) AS DOUBLE) AS click_rate,
           CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM c) AS DOUBLE) AS purchase_rate
    """,
    doc="Strict-order funnel analysis: per user, first view, then first "
    "click AFTER that view, then first purchase AFTER that click — each "
    "stage one conditional-min aggregation joined to the previous stage "
    "(no window over the whole event log, no cross join); ratios derive "
    "from exact counts.",
)
def q97_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Testdata(spark, sf_dir).events
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        v.agg(F.count(F.lit(1)).cast("long").alias("n_view"))
        .join(c.agg(F.count(F.lit(1)).cast("long").alias("n_view_click")))
        .join(p.agg(F.count(F.lit(1)).cast("long").alias("n_full_funnel")))
    )
    return counts.select(
        "n_view",
        "n_view_click",
        "n_full_funnel",
        (
            F.col("n_view_click").cast("double")
            / F.col("n_view").cast("double")
        ).alias("click_rate"),
        (
            F.col("n_full_funnel").cast("double")
            / F.col("n_view_click").cast("double")
        ).alias("purchase_rate"),
    )


# ===========================================================================
# q99 — TPC-H Q11 shape: filtered aggregation kept only when its share of
# the GLOBAL (same-filter) total clears a threshold — the scalar-subquery
# HAVING pattern. Testdata has no partsupp, so the "value" is supplier
# lineitem revenue within a 5-nation region (reshape documented in
# COVERAGE.md; the plan shape — grouped agg, 1-row global agg, broadcast
# scalar compare — is exactly Q11's decorrelated form).
# ===========================================================================

@query(
    "q99_supplier_value_share",
    oracle="""
    WITH sup AS (
      SELECT s_suppkey FROM supplier
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3','NATION_4')
    ),
    val AS (
      SELECT l_suppkey AS s_suppkey,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(18,4))) AS vdec
      FROM lineitem JOIN sup ON s_suppkey = l_suppkey
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, CAST(vdec AS DOUBLE) AS value
    FROM val
    WHERE CAST(vdec AS DOUBLE)
          > CAST((SELECT SUM(vdec) FROM val) AS DOUBLE) * 0.05
    """,
    doc="TPC-H Q11 shape (reshaped onto supplier revenue; no partsupp in "
    "testdata): per-supplier decimal-exact revenue over a nation-filtered "
    "supplier set, HAVING value > 0.05 * the same set's global total — "
    "grouped agg + 1-row scalar agg broadcast back. At 100 TB the scalar "
    "side is one row; the compare is a broadcast nested-loop of cost "
    "O(groups).",
)
def q99_supplier_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    td = Testdata(spark, sf_dir)
    nations = [f"NATION_{i}" for i in range(5)]
    sup = (
        td.supplier.join(
            td.nation,
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .where(F.col("n_name").isin(nations))
        .select("s_suppkey")
    )
    # the global total sums the DECIMAL per-supplier values, never the
    # doubles — a double SUM is partial-aggregation-order dependent, so
    # the 5% gate could flip a boundary supplier between engines or even
    # between partitionings (review r7)
    val = (
        td.lineitem.join(
            F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey")
        )
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(
            F.sum(
                _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            ).alias("vdec")
        )
    )
    total = val.agg(F.sum("vdec").alias("__tdec"))
    return (
        val.join(F.broadcast(total))
        .where(
            F.col("vdec").cast("double")
            > F.col("__tdec").cast("double") * F.lit(0.05)
        )
        .select("s_suppkey", F.col("vdec").cast("double").alias("value"))
    )


# ===========================================================================
# q100 — TPC-H Q22 shape: substring bucketing + global-avg scalar subquery
# + NOT EXISTS anti-join. Testdata customer has no c_phone; the "country
# code" is the last two digits of c_name (same mechanics, documented).
# ===========================================================================

@query(
    "q100_inactive_customer_balance",
    oracle="""
    WITH coded AS (
      SELECT c_custkey, c_acctbal,
             substring(c_name, length(c_name) - 1, 2) AS cntrycode
      FROM customer
      WHERE substring(c_name, length(c_name) - 1, 2) < '25'
    ),
    avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS a
      FROM coded WHERE c_acctbal > 0.0
    )
    SELECT cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS totacctbal
    FROM coded
    WHERE c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = coded.c_custkey
                        AND o_totalprice > 400000.0)
    GROUP BY cntrycode
    """,
    doc="TPC-H Q22 shape (country code = last 2 digits of c_name; no "
    "c_phone in testdata; 'inactive' = no order above 400k — every "
    "testdata customer has SOME order, so Q22's no-orders-at-all "
    "predicate would select nothing): substring bucketing, "
    "positive-balance global average as a broadcast scalar, NOT EXISTS "
    "with a pushed filter as a left-anti join against orders, "
    "decimal-exact balance sums. The anti-join shuffles only (custkey) "
    "pairs of the pre-filtered order subset; the avg is a 1-row "
    "broadcast.",
)
def q100_inactive_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    td = Testdata(spark, sf_dir)
    code = F.expr("substring(c_name, length(c_name) - 1, 2)")
    coded = (
        td.customer.withColumn("cntrycode", code)
        .where(F.col("cntrycode") < "25")
        .select("c_custkey", "c_acctbal", "cntrycode")
    )
    avg_bal = coded.where(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(_dec("c_acctbal")).cast("double")
            / F.count(F.lit(1))
        ).alias("__avg")
    )
    big_orders = (
        td.orders.where(F.col("o_totalprice") > 400000.0)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    inactive = (
        coded.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg"))
        .join(big_orders, "c_custkey", "left_anti")
    )
    return inactive.groupBy("cntrycode").agg(
        F.count(F.lit(1)).cast("long").alias("numcust"),
        F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
    )


# ===========================================================================
# q101 — TPC-H Q21 shape: suppliers who kept orders waiting. The classic
# double-correlated EXISTS / NOT EXISTS pattern over the same fact table.
# Testdata lineitem has no commit/receipt dates, so "late" is reshaped to
# l_shipdate > o_orderdate + 90 days (documented in COVERAGE.md, same
# convention as the q95/q99/q100 reshapes).
# ===========================================================================

@query(
    "q101_waiting_suppliers",
    oracle="""
    WITH l1 AS (
      SELECT l_orderkey, l_suppkey,
             (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM l1 JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE late
      AND n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3','NATION_4',
                     'NATION_5','NATION_6','NATION_7','NATION_8','NATION_9')
      AND EXISTS (SELECT 1 FROM l1 l2 WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM l1 l3 WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
    GROUP BY s_name ORDER BY numwait DESC, s_name ASC LIMIT 100
    """,
    doc="TPC-H Q21 shape ('late' reshaped to ship > order date + 90d; no "
    "commit/receipt dates in testdata): count late lineitems per supplier "
    "in finished multi-supplier orders where NO other supplier was late. "
    "The Spark side runs the DECORRELATED form — the oracle's correlated "
    "EXISTS / NOT EXISTS collapse into one (orderkey, suppkey) aggregate "
    "plus one orderkey aggregate over the same frame (n_suppliers >= 2, "
    "late_suppliers == 1), so the fact table shuffles twice on its own "
    "keys instead of probing two correlated subqueries per row — the plan "
    "you want when lineitem is 100 TB. Supplier/nation dims broadcast.",
)
def q101_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    td = Testdata(spark, sf_dir)
    nations = [f"NATION_{i}" for i in range(10)]
    l1 = (
        td.lineitem.join(
            td.orders.where(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            ).alias("late"),
        )
    )
    sup_gate = l1.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("s_late")
    )
    ord_gate = sup_gate.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.col("s_late").cast("int")).alias("n_late"),
    )
    gate = (
        sup_gate.where(F.col("s_late"))
        .join(
            ord_gate.where(
                (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
            ).select("l_orderkey"),
            "l_orderkey",
        )
        .select("l_orderkey", "l_suppkey")
    )
    sup = (
        td.supplier.join(
            F.broadcast(td.nation), F.col("n_nationkey") == F.col("s_nationkey")
        )
        .where(F.col("n_name").isin(nations))
        .select(F.col("s_suppkey"), F.col("s_name"))
    )
    waiting = (
        l1.where(F.col("late"))
        .join(gate, ["l_orderkey", "l_suppkey"])
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
    )
    return (
        waiting.groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


# ===========================================================================
# q111 — TPC-H Q2 shape: the correlated-scalar-MIN equality pattern
# ("cheapest supplier per part"), decorrelated to a min-aggregate + an
# equality join back. Reshaped onto lineitem unit prices (no partsupp /
# ps_supplycost in testdata; COVERAGE.md).
# ===========================================================================

@query(
    "q111_cheapest_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN((CAST(round(l_extendedprice * 100) AS BIGINT) * 10000)
                 // CAST(l_quantity AS BIGINT)) AS unit_u
      FROM lineitem GROUP BY 1, 2
    ),
    best AS (SELECT l_partkey, MIN(unit_u) AS best_unit FROM cost GROUP BY 1)
    SELECT c.l_partkey AS p_partkey, p.p_name, s.s_name, n.n_name,
           CAST(c.unit_u AS DOUBLE) / 1000000.0 AS unit_price
    FROM cost c
    JOIN best b ON b.l_partkey = c.l_partkey AND c.unit_u = b.best_unit
    JOIN part p ON p.p_partkey = c.l_partkey AND p.p_size <= 10
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region rg ON rg.r_regionkey = n.n_regionkey
                  AND rg.r_name = 'ASIA'
    """,
    doc="TPC-H Q2 shape (reshaped: unit price = extendedprice/quantity "
    "per (part, supplier) in EXACT integer micro-units — cents*10000 "
    "floor-divided by quantity, never round() over a double quotient: "
    "Spark rounds HALF_UP on the shortest repr while DuckDB rounds the "
    "binary double, so exact .xxxxxx5 ties diverge by 1e-6, and the "
    "testdata contains live tie rows at quantity 32/64; no partsupp in "
    "testdata): for small parts, the ASIA suppliers achieving the "
    "part's global-minimum unit price — the correlated scalar MIN "
    "decorrelated into a per-part aggregate joined back on exact BIGINT "
    "equality. "
    "Dims broadcast; the small-part filter is broadcast-semi-joined "
    "against lineitem BEFORE the (part, supplier) aggregate (the "
    "per-part MIN is invariant to part selection), so the fact's widest "
    "shuffle already carries only small-part rows.",
)
def q111_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    td = Testdata(spark, sf_dir)
    # exact integer micro-units: `div` is integral division (matches
    # DuckDB's BIGINT //) — no double rounding anywhere in the key
    unit_u = F.expr(
        "(CAST(round(l_extendedprice * 100) AS BIGINT) * 10000L)"
        " div CAST(l_quantity AS BIGINT)"
    )
    small = td.part.where(F.col("p_size") <= 10).select("p_partkey", "p_name")
    # The part filter is pushed BELOW the cost aggregate (r7 VERDICT #7):
    # per-(part, supplier) MIN is invariant to which parts survive, so a
    # broadcast semi-join of the small parts against lineitem FIRST
    # shrinks the widest shuffle — the groupBy(l_partkey, l_suppkey)
    # exchange — by the part-filter selectivity. Plan-asserted in
    # tests/test_plans.py (the LeftSemi broadcast join sits under the
    # first Exchange).
    cost = (
        td.lineitem.join(
            F.broadcast(small.select("p_partkey")),
            F.col("p_partkey") == F.col("l_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(unit_u).alias("unit_u"))
    )
    best = cost.groupBy("l_partkey").agg(F.min("unit_u").alias("best_unit"))
    sup_nat = (
        td.supplier.join(
            F.broadcast(td.nation), F.col("n_nationkey") == F.col("s_nationkey")
        )
        .join(
            F.broadcast(td.region.where(F.col("r_name") == "ASIA")),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    return (
        cost.join(best, "l_partkey")
        .where(F.col("unit_u") == F.col("best_unit"))
        .join(F.broadcast(small), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(sup_nat), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            "s_name",
            "n_name",
            (F.col("unit_u").cast("double") / 1000000.0)
            .alias("unit_price"),
        )
    )


# ===========================================================================
# q119 — TPC-H Q18 shape: large-volume orders. The IN-subquery over a
# grouped HAVING (orders whose lineitems sum past a quantity threshold)
# decorrelated into an aggregate joined back on the key — the classic
# "find the heavy entities, then widen with their dimensions" pattern
# (reference analog: the campaign-totals join family, scripts/main.py).
# ===========================================================================

@query(
    "q119_large_volume_orders",
    oracle="""
    WITH heavy AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) > 150
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           h.total_qty
    FROM heavy h
    JOIN orders o ON o.o_orderkey = h.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
    doc="TPC-H Q18 shape: orders whose lineitem quantity total exceeds a "
    "threshold (HAVING over a per-order aggregate), widened with order + "
    "customer attributes. Quantities are integral in the corpus, so the "
    "BIGINT sum is exact on both engines. The heavy-order aggregate is "
    "computed ONCE and joined — never recomputed per row; customer is a "
    "broadcast dim at test scale and a plain shuffle join at 100 TB "
    "(AQE picks; nothing in the plan pins it).",
)
def q119_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    td = Testdata(spark, sf_dir)
    heavy = (
        td.lineitem.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty")
        )
        .where(F.col("total_qty") > 150)
    )
    return (
        heavy.join(
            td.orders, F.col("o_orderkey") == F.col("l_orderkey")
        )
        .join(td.customer, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
    )


# ===========================================================================
# q120 — TPC-H Q20 shape: the nested correlated-aggregate semi-join
# ("suppliers with excess stock of a qualifying part"). The testdata has
# no partsupp/availqty, so the correlated threshold is reshaped onto
# shipped quantity itself: a supplier QUALIFIES on a part when its shipped
# quantity exceeds TWICE the part's fair share (total / n_suppliers) — the
# same shape (inner agg per (part, supplier), correlated scalar per part,
# comparison, then DISTINCT suppliers semi-joined back to the dimension).
# ===========================================================================

@query(
    "q120_dominant_suppliers",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS BIGINT)) AS q
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    pt AS (
      SELECT l_partkey, SUM(q) AS t, COUNT(*) AS ns
      FROM ps GROUP BY l_partkey
    ),
    qual AS (
      SELECT DISTINCT ps.l_suppkey
      FROM ps JOIN pt USING (l_partkey)
      WHERE ps.q * pt.ns > 2 * pt.t
    )
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM qual q
    JOIN supplier s ON s.s_suppkey = q.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    """,
    doc="TPC-H Q20 shape (reshaped: no partsupp in the corpus, so 'stock "
    "exceeding half the shipped quantity' becomes 'shipped quantity "
    "exceeding 2x the part's fair share'): inner aggregate per (part, "
    "supplier), correlated per-part scalar (total + supplier count) "
    "joined back, integer-exact comparison (q*ns > 2t — no division), "
    "DISTINCT qualifying suppliers semi-joined to the supplier dim. "
    "The (part, supplier) aggregate is the only wide shuffle; the "
    "per-part rollup reuses its output (pennies on top), and the final "
    "joins carry only the distinct supplier keys.",
)
def q120_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    td = Testdata(spark, sf_dir)
    ps = td.lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("q")
    )
    pt = ps.groupBy("l_partkey").agg(
        F.sum("q").alias("t"), F.count(F.lit(1)).alias("ns")
    )
    qual = (
        ps.join(pt, "l_partkey")
        .where(F.col("q") * F.col("ns") > 2 * F.col("t"))
        .select("l_suppkey")
        .distinct()
    )
    sup = td.supplier.join(
        F.broadcast(td.nation),
        F.col("n_nationkey") == F.col("s_nationkey"),
    )
    return qual.join(
        sup, F.col("s_suppkey") == F.col("l_suppkey")
    ).select("s_suppkey", "s_name", "n_name")


# ===========================================================================
# q126 — TPC-H Q15 shape: the revenue "view" + correlated scalar MAX.
# revenue0 per supplier over one quarter, then the supplier(s) whose
# revenue equals the view's maximum — decorrelated into an aggregate
# cross-joined as a broadcast scalar and compared on EXACT DECIMAL (the
# float-equality trap Q15 is famous for never arises: both engines sum
# DECIMAL(18,4) and compare decimals, casting to double only for output).
# ===========================================================================

@query(
    "q126_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(18,4))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM rev r
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    doc="TPC-H Q15 shape: quarterly supplier revenue view + correlated "
    "scalar MAX, decorrelated to a broadcast one-row aggregate joined "
    "back on exact DECIMAL equality (the ship-date filter pushes to the "
    "scan; the view is computed ONCE and reused for both the max and "
    "the final rows via a self-contained plan).",
)
def q126_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    td = Testdata(spark, sf_dir)
    rev = (
        td.lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(18,4)")
            ).alias("total_revenue")
        )
    )
    top = rev.agg(F.max("total_revenue").alias("__mx"))
    return (
        rev.join(F.broadcast(top), F.col("total_revenue") == F.col("__mx"))
        .join(td.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey", "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


# ===========================================================================
# q127 — sliding time-range window frame: 7-day trailing revenue per day
# (RANGE BETWEEN 6 PRECEDING AND CURRENT ROW over the day ordinal) — the
# window-frame family member q28's ROWS frames don't cover: a RANGE frame
# over a time axis includes every row within the interval REGARDLESS of
# row count, so days with no orders still shrink the trailing sum. Spark's
# rangeBetween is numeric-only, so the day is projected to an integer
# ordinal (datediff from epoch) — the same expression both engines run.
# ===========================================================================

@query(
    "q127_trailing_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             date_diff('day', DATE '1970-01-01',
                       CAST(o_orderdate AS DATE)) AS d_ord,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders
      GROUP BY 1, 2
    )
    SELECT d,
           CAST(rev AS DOUBLE) AS day_revenue,
           CAST(SUM(rev) OVER (
             ORDER BY d_ord
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_7d_revenue
    FROM daily
    """,
    doc="Sliding 7-day trailing revenue via a RANGE window frame over the "
    "integer day ordinal (gaps in the calendar correctly shrink the "
    "window — a ROWS frame would include 7 PRIOR ORDER DAYS instead). "
    "Decimal day sums; the global RANGE window runs over DAY-grain "
    "pre-aggregated rows (bounded by the date span — the "
    "hist_quantile/global-window discipline).",
)
def q127_trailing_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    td = Testdata(spark, sf_dir)
    daily = (
        td.orders.groupBy(
            F.to_date("o_orderdate").alias("d"),
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
            ).alias("d_ord"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
        )
    )
    # the battery's ONE unpartitioned window, and it is bounded by
    # construction: it runs over `daily` — day-grain pre-aggregated rows,
    # at most one per calendar day of the order span (~2,400 for the
    # TPC-H date range) — never over row-grain data, so the single
    # WindowExec partition holds a few KB at any corpus scale (the
    # hist_quantile discipline; round-15 audit of the r13 bench-tail
    # `WindowExec single partition` warning)
    w = W.orderBy("d_ord").rangeBetween(-6, 0)
    return daily.select(
        "d",
        F.col("rev").cast("double").alias("day_revenue"),
        F.sum("rev").over(w).cast("double").alias("trailing_7d_revenue"),
    )


# ===========================================================================
# q128 — TPC-H Q7 shape: volume shipping between two nations. lineitem
# joined through BOTH its supplier-nation and (via orders) its
# customer-nation, restricted to an unordered nation pair, revenue per
# (supp_nation, cust_nation, ship year). Two independent dim chains hang
# off one fact scan; both broadcast.
# ===========================================================================

@query(
    "q128_nation_trade_volume",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(extract(year FROM l.l_shipdate) AS INTEGER) AS l_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    WHERE ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
        OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape: revenue flowing between a nation pair per ship "
    "year — the fact joins BOTH dim chains (supplier->nation and "
    "orders->customer->nation), the unordered-pair predicate keeps both "
    "directions, dims broadcast, one fact shuffle for the final rollup.",
)
def q128_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    td = Testdata(spark, sf_dir)
    sn = td.nation.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    cn = td.nation.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_name").alias("cust_nation"),
    )
    sup = td.supplier.join(
        F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey")
    ).select("s_suppkey", "supp_nation")
    cust = td.customer.join(
        F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey")
    ).select("c_custkey", "cust_nation")
    ord_cn = td.orders.join(
        cust, F.col("c_custkey") == F.col("o_custkey")
    ).select("o_orderkey", "cust_nation")
    pair = (
        (F.col("supp_nation") == "NATION_3")
        & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7")
        & (F.col("cust_nation") == "NATION_3")
    )
    return (
        td.lineitem.join(
            F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey")
        )
        .join(ord_cn, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(18,4)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
