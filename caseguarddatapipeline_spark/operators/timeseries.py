"""Time-series analytics: regression trends and date-spine gap filling.

- a26: built-in regression aggregates (regr_slope/regr_intercept/regr_r2)
  — trend of order value over time per status, one aggregation pass, no
  MLlib dependency.
- a27: the date-spine pattern — generate the complete calendar with
  sequence()+explode, left-join daily aggregates, zero-fill gaps. The
  canonical fix for "days with no rows vanish from the report"; the spine
  is generated data (a few hundred rows), so the join broadcasts it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources import load_table


def a26_price_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear trend of order value over order date per status: slope is
    value-per-day (epoch days as x), with intercept and R² — the SQL
    regression aggregates, partial+final like any other agg."""
    orders = load_table(spark, sf_dir, "orders")
    x = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")).cast(
        "double"
    )
    y = F.col("o_totalprice")
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.regr_slope(y, x), 6).alias("slope_per_day"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
    )


SPINE_START, SPINE_END = "1997-01-01", "1997-03-31"


def a27_daily_order_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete daily order counts for Q1-1997: date spine via
    sequence+explode, broadcast left join of the daily agg, zero-filled
    gaps flagged."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit(SPINE_START))
            & (F.col("o_orderdate") <= F.lit(f"{SPINE_END} 23:59:59"))
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("day_value"),
        )
    )
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(SPINE_START).cast("date"),
                F.lit(SPINE_END).cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    return (
        spine.join(daily, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("day_value", F.lit(0.0)).alias("day_value"),
            F.col("n_orders").isNull().alias("was_gap"),
        )
    )


def t10_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed as-of join: each event picks the LATEST order of the
    same customer at-or-before the event time (the point-in-time lookup
    every time-series store ships as a primitive; the reference's
    serialno-watermark check at change_tracking.py:154-246 is the same
    "state as of this moment" question).

    Spark lacks ASOF JOIN, so this is the scale-correct composition: tag
    both sides, union, ONE shuffle on the key, and an ignore-nulls
    last_value window carries the most recent order attributes forward
    onto each event row. No range explode, no per-row subquery — state
    flows in a single sort within each key partition. Ties (two orders
    at the same instant) break deterministically by highest o_orderkey;
    the DuckDB oracle is the identical union+window, so every matched
    attribute is value-checked."""
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    left = events.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        "event_id",
        F.lit(1).alias("is_left"),
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    right = orders.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(0).alias("is_left"),
        "o_orderkey",
        "o_totalprice",
    )
    w = (
        Window.partitionBy("k")
        .orderBy(
            F.col("t").asc(),
            F.col("is_left").asc(),
            F.col("o_orderkey").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = left.unionByName(right)
    return (
        u.withColumn(
            "matched_orderkey", F.last("o_orderkey", ignorenulls=True).over(w)
        )
        .withColumn(
            "matched_totalprice",
            F.last("o_totalprice", ignorenulls=True).over(w),
        )
        .filter(F.col("is_left") == 1)
        .select(
            "event_id",
            F.col("k").alias("user_id"),
            "matched_orderkey",
            "matched_totalprice",
        )
    )


def t12_range_join_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketized RANGE (point-in-interval) join — the other primitive
    Spark lacks natively. Per user, 'signup'/'error' events open state
    intervals (valid until the next such event — t11's SCD2 windows);
    every 'purchase' event is tagged with the interval containing it. A
    naive formulation is a theta join (key equality + BETWEEN), which
    Spark executes as a per-key nested loop; the scale-correct shape
    bucketizes time, explodes each interval to the DAY buckets it
    overlaps (clamped to the event horizon, so the fan-out is bounded by
    interval length, never unbounded), equi-joins on (key, day) and
    applies the exact range predicate locally — an O(n·m)-per-key loop
    becomes a hash join. Intervals partition time per key, so each probe
    matches at most one interval; the DuckDB oracle is the DIRECT theta
    join, proving the bucketed rewrite exact."""
    events = load_table(spark, sf_dir, "events")

    iv = (
        events.filter(F.col("event_type").isin("signup", "error"))
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
        )
        .withColumn("valid_to", F.lead("valid_from").over(
            # state order is (ts, state): two state events at the SAME
            # timestamp would otherwise make the interval chain (and the
            # purchases' reported state) nondeterministic between runs
            # and engines
            Window.partitionBy("user_id").orderBy("valid_from", "state")
        ))
    )
    horizon = events.agg(
        F.max(F.col("ts") + F.expr("interval 1 second")).alias("h")
    )
    clamped = (
        iv.crossJoin(F.broadcast(horizon))
        .withColumn("hi", F.coalesce("valid_to", F.col("h")))
        .filter(F.col("hi") > F.col("valid_from"))
        .withColumn(
            "day",
            F.explode(
                F.sequence(
                    F.date_trunc("day", "valid_from"),
                    F.date_trunc("day", F.expr("hi - interval 1 microsecond")),
                    F.expr("interval 1 day"),
                )
            ),
        )
        .select("user_id", "state", "valid_from", "valid_to", "day")
    )
    probe = events.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.date_trunc("day", "ts").alias("day"),
    )
    return (
        probe.join(
            clamped,
            (probe.p_user == clamped.user_id) & (probe.day == clamped.day),
        )
        .filter(
            (F.col("p_ts") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("p_ts") < F.col("valid_to")))
        )
        .select(
            "event_id",
            F.col("p_user").alias("entity_id"),
            "state",
            F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        )
    )


def t14_interpolate_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling with LINEAR interpolation — a27's spine zero-fills;
    metering/fill-forward pipelines instead estimate missing days between
    known neighbors. Per user (< 20, purchase events only, so gaps
    actually occur): build the per-user day spine, locate each gap's
    bracketing observations with ignore-nulls last/first window carries,
    and interpolate value_micro = prev + (next − prev)·(d − d_prev) DIV
    (d_next − d_prev) — INTEGER arithmetic end-to-end (values in exact
    micro-units, days as epoch-day ints), so both engines produce the
    identical fill. Leading/trailing gaps (no bracket) stay NULL. One
    shuffle on user_id; the spine explode is per-user-range generated
    data, not a cross join."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.filter((F.col("user_id") < 20) & (F.col("event_type") == "purchase"))
        .groupBy(
            "user_id", F.to_date("ts").alias("day")
        )
        .agg(
            F.sum((F.col("value").cast("decimal(18,6)") * 1000000).cast("long"))
            .alias("v_micro")
        )
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs = F.when(
        F.col("v_micro").isNotNull(),
        F.struct(F.datediff("day", F.lit("1970-01-01").cast("date")).alias("d"),
                 F.col("v_micro").alias("v")),
    )
    filled = (
        spine.join(daily, ["user_id", "day"], "left")
        .withColumn("prev", F.last(obs, ignorenulls=True).over(w_prev))
        .withColumn("next", F.first(obs, ignorenulls=True).over(w_next))
        .withColumn("d_i", F.datediff("day", F.lit("1970-01-01").cast("date")))
    )
    return filled.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.when(F.col("v_micro").isNotNull(), F.col("v_micro"))
        .otherwise(
            F.when(
                F.col("prev").isNotNull() & F.col("next").isNotNull(),
                F.expr(
                    "prev.v + ((next.v - prev.v) * (d_i - prev.d))"
                    " DIV (next.d - prev.d)"
                ),
            )
        )
        .alias("v_micro_filled"),
        F.col("v_micro").isNull().alias("was_gap"),
    )


QUERIES = {
    "t14_interpolate_gaps": t14_interpolate_gaps,
    "a26_price_trend": a26_price_trend,
    "a27_daily_order_spine": a27_daily_order_spine,
    "t10_asof_join": t10_asof_join,
    "t12_range_join_state": t12_range_join_state,
}

ORACLES = {
    "t14_interpolate_gaps": """
        WITH daily AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
                                 AS BIGINT)) AS BIGINT) AS v_micro
            FROM events
            WHERE user_id < 20 AND event_type = 'purchase'
            GROUP BY user_id, CAST(ts AS DATE)
        ), spine AS (
            SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
            FROM (SELECT user_id, min(day) AS d0, max(day) AS d1
                  FROM daily GROUP BY user_id)
        ), joined AS (
            SELECT s.user_id, s.day, d.v_micro,
                   date_diff('day', DATE '1970-01-01', s.day) AS d_i
            FROM spine s LEFT JOIN daily d
              ON s.user_id = d.user_id AND s.day = d.day
        ), carried AS (
            SELECT *,
                   last_value(CASE WHEN v_micro IS NOT NULL THEN d_i END
                              IGNORE NULLS) OVER wp AS prev_d,
                   last_value(CASE WHEN v_micro IS NOT NULL THEN v_micro END
                              IGNORE NULLS) OVER wp AS prev_v,
                   first_value(CASE WHEN v_micro IS NOT NULL THEN d_i END
                               IGNORE NULLS) OVER wn AS next_d,
                   first_value(CASE WHEN v_micro IS NOT NULL THEN v_micro END
                               IGNORE NULLS) OVER wn AS next_v
            FROM joined
            WINDOW wp AS (PARTITION BY user_id ORDER BY day
                          ROWS UNBOUNDED PRECEDING),
                   wn AS (PARTITION BY user_id ORDER BY day
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
               CAST(CASE WHEN v_micro IS NOT NULL THEN v_micro
                    WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                    THEN prev_v + ((next_v - prev_v) * (d_i - prev_d))
                                  // (next_d - prev_d)
                    END AS BIGINT) AS v_micro_filled,
               v_micro IS NULL AS was_gap
        FROM carried
    """,
    # The oracle is the DIRECT theta join (key equality + range
    # predicate) — value-equality with the Spark side proves the
    # bucketized equi-join rewrite exact.
    "t12_range_join_state": """
        WITH iv AS (
            SELECT user_id, event_type AS state, ts AS valid_from,
                   lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type) AS valid_to
            FROM events
            WHERE event_type IN ('signup', 'error')
        )
        SELECT e.event_id, e.user_id AS entity_id, iv.state,
               strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
        FROM events e JOIN iv
          ON e.user_id = iv.user_id
         AND e.ts >= iv.valid_from
         AND (iv.valid_to IS NULL OR e.ts < iv.valid_to)
        WHERE e.event_type = 'purchase'
    """,
    "a26_price_trend": """
        SELECT o_orderstatus,
               count(*) AS n_orders,
               round(regr_slope(o_totalprice,
                     date_diff('day', DATE '1992-01-01',
                               CAST(o_orderdate AS DATE))), 6) AS slope_per_day,
               round(regr_intercept(o_totalprice,
                     date_diff('day', DATE '1992-01-01',
                               CAST(o_orderdate AS DATE))), 4) AS intercept,
               round(regr_r2(o_totalprice,
                     date_diff('day', DATE '1992-01-01',
                               CAST(o_orderdate AS DATE))), 6) AS r2
        FROM orders GROUP BY o_orderstatus
    """,
    "a27_daily_order_spine": """
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS day_value
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate <= TIMESTAMP '1997-03-31 23:59:59'
            GROUP BY CAST(o_orderdate AS DATE)
        ), spine AS (
            SELECT unnest(generate_series(DATE '1997-01-01', DATE '1997-03-31',
                                          INTERVAL 1 DAY))::DATE AS day
        )
        SELECT strftime(spine.day, '%Y-%m-%d') AS day,
               coalesce(n_orders, 0) AS n_orders,
               coalesce(day_value, 0.0) AS day_value,
               (n_orders IS NULL) AS was_gap
        FROM spine LEFT JOIN daily ON spine.day = daily.day
    """,
    "t10_asof_join": """
        WITH u AS (
            SELECT user_id AS k, ts AS t, event_id, 1 AS is_left,
                   CAST(NULL AS BIGINT) AS o_orderkey,
                   CAST(NULL AS DOUBLE) AS o_totalprice
            FROM events
            UNION ALL
            SELECT o_custkey, o_orderdate, NULL, 0, o_orderkey, o_totalprice
            FROM orders
        ), m AS (
            SELECT event_id, k, is_left,
                   last_value(o_orderkey IGNORE NULLS) OVER (
                       PARTITION BY k
                       ORDER BY t ASC, is_left ASC, o_orderkey ASC NULLS FIRST
                       ROWS UNBOUNDED PRECEDING
                   ) AS matched_orderkey,
                   last_value(o_totalprice IGNORE NULLS) OVER (
                       PARTITION BY k
                       ORDER BY t ASC, is_left ASC, o_orderkey ASC NULLS FIRST
                       ROWS UNBOUNDED PRECEDING
                   ) AS matched_totalprice
            FROM u
        )
        SELECT event_id, k AS user_id, matched_orderkey, matched_totalprice
        FROM m WHERE is_left = 1
    """,
}
