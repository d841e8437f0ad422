"""Sessionization + grouped-map analytics — the remaining training-data
pipeline shapes: gap-based session reconstruction over the event stream
(lag + cumulative-sum windows, W-series extension) and a per-group pandas
operator (applyInPandas) cross-checked against its SQL equivalent.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..sources import load_table

SESSION_GAP_MIN = 30


def w8_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts when the inter-event
    gap exceeds 30 minutes. Two stacked windows on the same (user_id, ts)
    ordering — one shuffle on user_id total, both windows reuse it.

    At scale this is the canonical log-sessionization plan; the streaming
    twin is ``F.session_window`` (see streaming/windows.py for the
    watermarked variant of windowed aggregation)."""
    events = load_table(spark, sf_dir, "events")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # cast("double") keeps sub-second precision (unix_timestamp truncates
    # to seconds, which shifts session boundaries vs the oracle's epoch())
    secs = F.col("ts").cast("timestamp").cast("double")
    gap_min = (secs - F.lag(secs).over(w_ord)) / 60.0
    is_new = F.when(
        gap_min.isNull() | (gap_min > SESSION_GAP_MIN), 1
    ).otherwise(0)
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_sessions = events.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.sum(is_new).over(w_run).alias("session_id"),
    )
    return (
        with_sessions.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.round(
                (F.max(F.col("ts").cast("timestamp").cast("double"))
                 - F.min(F.col("ts").cast("timestamp").cast("double")))
                / 60.0,
                4,
            ).alias("duration_min"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
    )


def w9_rolling_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour rolling activity per user: for each event, how many events
    and how much value the user produced in the trailing hour — a RANGE
    frame over epoch seconds (rangeBetween needs a numeric ordering key).
    The per-user shuffle is shared with any other user_id-keyed window.
    Bounded slice (user_id < 30) keeps the oracle comparison light; the
    plan is identical unbounded."""
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    secs = F.col("ts").cast("timestamp").cast("double")
    w = (
        Window.partitionBy("user_id")
        .orderBy(secs)
        .rangeBetween(-3600, Window.currentRow)
    )
    return events.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("events_last_hour"),
        F.round(F.sum("value").over(w), 4).alias("value_last_hour"),
    )


CENTROID_SCHEMA = StructType(
    [
        StructField("label", IntegerType()),
        StructField("n_vectors", LongType()),
        StructField("centroid_norm", DoubleType()),
        StructField("avg_dist_to_centroid", DoubleType()),
    ]
)


def _centroid_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    mat = np.stack(pdf["embedding"].map(lambda v: np.asarray(v, dtype="float64")))
    cent = mat.mean(axis=0)
    dists = np.sqrt(((mat - cent) ** 2).sum(axis=1))
    return pd.DataFrame(
        {
            "label": [int(pdf["label"].iloc[0])],
            "n_vectors": [len(pdf)],
            "centroid_norm": [round(float(np.sqrt((cent * cent).sum())), 6)],
            "avg_dist_to_centroid": [round(float(dists.mean()), 6)],
        }
    )


def u6_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid statistics via the grouped-map pandas operator
    (groupBy().applyInPandas): each label's vectors arrive as ONE pandas
    frame — whole-group semantics the chunked mapInPandas path can't
    guarantee — and numpy does the dense math. Oracle-checked: the same
    centroid algebra is expressible in SQL via unnest + AVG, so this query
    validates the pandas path against the relational one."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", "embedding")
        .groupBy("label")
        .applyInPandas(_centroid_stats, schema=CENTROID_SCHEMA)
    )


def w10_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: how many users complete signup → view →
    purchase IN CHRONOLOGICAL ORDER (dashboard.py:311-382's conversion
    counters, done as one window pass instead of per-user loops).
    Running-seen flags over a single (user, ts, event_id) sort: a stage
    counts only once every earlier stage has already occurred — one
    shuffle on user_id, and the two chained window ops reuse the same
    sort. Output is one row of stage cardinalities."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seen_signup = F.max(
        F.when(F.col("event_type") == "signup", 1).otherwise(0)
    ).over(w)
    staged = events.select(
        "user_id", "ts", "event_id", "event_type", seen_signup.alias("s_seen")
    )
    seen_view = F.max(
        F.when((F.col("event_type") == "view") & (F.col("s_seen") == 1), 1)
        .otherwise(0)
    ).over(w)
    staged2 = staged.select(
        "user_id",
        "event_type",
        "s_seen",
        seen_view.alias("v_seen"),
    )
    per_user = staged2.groupBy("user_id").agg(
        F.max("s_seen").alias("did_signup"),
        F.max("v_seen").alias("did_view_after"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("v_seen") == 1), 1
            ).otherwise(0)
        ).alias("did_purchase_after"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("did_signup").cast("long").alias("n_signup"),
        F.sum("did_view_after").cast("long").alias("n_view_after_signup"),
        F.sum("did_purchase_after").cast("long").alias("n_full_funnel"),
    )


def w12_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity month,
    counted in each later month they remained active — the
    activity-continuity analysis dashboard.py:311-382 approximates with
    per-case loops, as two hash aggregates. Plan: per-(user, month)
    distinct → broadcast-joinable first-month table → count per (cohort,
    offset). Shuffles only on user_id and the tiny (cohort, offset)
    key — no windows, no sorts; at 100 TB both aggs combine map-side."""
    events = load_table(spark, sf_dir, "events")
    monthly = events.select(
        "user_id", F.date_format("ts", "yyyy-MM").alias("month")
    ).distinct()
    cohorts = monthly.groupBy("user_id").agg(F.min("month").alias("cohort"))
    return (
        monthly.join(cohorts, "user_id")
        .groupBy(
            "cohort",
            (
                (F.split("month", "-")[0].cast("int") * 12
                 + F.split("month", "-")[1].cast("int"))
                - (F.split("cohort", "-")[0].cast("int") * 12
                   + F.split("cohort", "-")[1].cast("int"))
            ).alias("month_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


def w13_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total within group (RATIO_TO_REPORT): each nation's
    share of its region's revenue — the windowed-aggregate-over-aggregate
    BI shape. The window runs over the 25-row nation aggregate, never the
    fact table: facts reduce FIRST (partial+final hash agg), dims join
    broadcast, and only then does the tiny share window run — the
    fact-then-window ordering that keeps the window O(groups) at 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    # factor-wise decimal casts (the q9 technique): the 2dp×2dp product
    # and its sum are exact and association-order-free in both engines
    revenue = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    )
    per_nation = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(revenue.alias("revenue"))
    )
    total = F.sum("revenue").over(Window.partitionBy("region"))
    return per_nation.select(
        "region",
        "nation",
        F.round(F.col("revenue").cast("double"), 2).alias("revenue"),
        F.round((F.col("revenue") / total).cast("double"), 6).alias("share"),
    )


def w14_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over per-user event sequences:
    (event_type → next event_type) frequencies with an integer per-mille
    share of each source state's outgoing edges — the behavioral-model
    input funnel/anomaly analyses start from. One lead() window over the
    same (user_id, ts) shuffle the other W-series ops ride (event_id
    tie-breaks equal timestamps for a total order), then a
    bounded-cardinality groupBy (|event types|² rows out). Integer DIV
    half-up arithmetic, so the oracle is exact. Scales as one shuffle on
    user_id + a map-side-combinable count."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = events.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    return (
        steps.groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "out_total",
            F.sum("n").over(Window.partitionBy("event_type")),
        )
        .select(
            "event_type",
            "next_type",
            "n",
            F.expr("(2 * n * 1000 + out_total) DIV (2 * out_total)").alias(
                "share_milli"
            ),
        )
    )


QUERIES = {
    "w14_event_transitions": w14_event_transitions,
    "w12_cohort_retention": w12_cohort_retention,
    "w13_revenue_share": w13_revenue_share,
    "w8_sessionize": w8_sessionize,
    "w9_rolling_activity": w9_rolling_activity,
    "u6_label_centroids": u6_label_centroids,
    "w10_event_funnel": w10_event_funnel,
}

ORACLES = {
    "w14_event_transitions": """
        WITH steps AS (
            SELECT event_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS next_type
            FROM events
        ), counts AS (
            SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
            FROM steps WHERE next_type IS NOT NULL
            GROUP BY event_type, next_type
        )
        SELECT event_type, next_type, n,
               CAST((2 * n * 1000 + sum(n) OVER (PARTITION BY event_type))
                    // (2 * sum(n) OVER (PARTITION BY event_type))
                    AS BIGINT) AS share_milli
        FROM counts
    """,
    "w13_revenue_share": """
        WITH per_nation AS (
            SELECT r_name AS region, n_name AS nation,
                   sum(CAST(l_extendedprice AS DECIMAL(18,2))
                       * (CAST(1 AS DECIMAL(18,2))
                          - CAST(l_discount AS DECIMAL(18,2)))) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
        )
        SELECT region, nation,
               round(CAST(revenue AS DOUBLE), 2) AS revenue,
               round(CAST(revenue / sum(revenue) OVER (PARTITION BY region)
                          AS DOUBLE), 6) AS share
        FROM per_nation
    """,
    "w12_cohort_retention": """
        WITH monthly AS (
            SELECT DISTINCT user_id, strftime(ts, '%Y-%m') AS month
            FROM events
        ), cohorts AS (
            SELECT user_id, min(month) AS cohort FROM monthly GROUP BY user_id
        )
        SELECT cohort,
               (CAST(string_split(month, '-')[1] AS INT) * 12
                + CAST(string_split(month, '-')[2] AS INT))
               - (CAST(string_split(cohort, '-')[1] AS INT) * 12
                  + CAST(string_split(cohort, '-')[2] AS INT)) AS month_offset,
               count(DISTINCT m.user_id) AS n_active
        FROM monthly m JOIN cohorts USING (user_id)
        GROUP BY 1, 2
    """,
    "w10_event_funnel": """
        WITH staged AS (
            SELECT user_id, ts, event_id, event_type,
                   max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                       OVER w AS s_seen
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING)
        ), staged2 AS (
            SELECT user_id, event_type, s_seen,
                   max(CASE WHEN event_type = 'view' AND s_seen = 1
                            THEN 1 ELSE 0 END) OVER w AS v_seen
            FROM staged
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING)
        ), per_user AS (
            SELECT user_id,
                   max(s_seen) AS did_signup,
                   max(v_seen) AS did_view_after,
                   max(CASE WHEN event_type = 'purchase' AND v_seen = 1
                            THEN 1 ELSE 0 END) AS did_purchase_after
            FROM staged2 GROUP BY user_id
        )
        SELECT count(*) AS n_users,
               CAST(sum(did_signup) AS BIGINT) AS n_signup,
               CAST(sum(did_view_after) AS BIGINT) AS n_view_after_signup,
               CAST(sum(did_purchase_after) AS BIGINT) AS n_full_funnel
        FROM per_user
    """,
    "w9_rolling_activity": """
        SELECT user_id, event_id,
               count(*) OVER w AS events_last_hour,
               round(sum(value) OVER w, 4) AS value_last_hour
        FROM events
        WHERE user_id < 30
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    "w8_sessionize": """
        WITH gaps AS (
            SELECT user_id, event_id, ts, value,
                   (epoch(ts) - epoch(lag(ts) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id))) / 60.0
                       AS gap_min
            FROM events
        ), flagged AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN gap_min IS NULL OR gap_min > 30 THEN 1 ELSE 0 END
                       AS is_new
            FROM gaps
        ), sessions AS (
            SELECT user_id, ts, value,
                   CAST(sum(is_new) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS session_id
            FROM flagged
        )
        SELECT user_id, session_id,
               count(*) AS n_events,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               round((epoch(max(ts)) - epoch(min(ts))) / 60.0, 4) AS duration_min,
               round(sum(value), 4) AS session_value
        FROM sessions GROUP BY user_id, session_id
    """,
    # u6: mean/dist algebra in SQL via unnest — validates the pandas path
    "u6_label_centroids": """
        WITH cent AS (
            SELECT label, pos, avg(v) AS c
            FROM (SELECT label, unnest(list_transform(embedding,
                                       x -> CAST(x AS DOUBLE))) AS v,
                         generate_subscripts(embedding, 1) AS pos
                  FROM embeddings)
            GROUP BY label, pos
        ), cnorm AS (
            SELECT label, sqrt(sum(c * c)) AS centroid_norm
            FROM cent GROUP BY label
        ), dists AS (
            SELECT e.label, e.vec_id,
                   sqrt(sum((ev.v - cent.c) * (ev.v - cent.c))) AS dist
            FROM embeddings e,
                 LATERAL (SELECT unnest(list_transform(e.embedding,
                                        x -> CAST(x AS DOUBLE))) AS v,
                          generate_subscripts(e.embedding, 1) AS pos) ev
            JOIN cent ON cent.label = e.label AND cent.pos = ev.pos
            GROUP BY e.label, e.vec_id
        )
        SELECT label,
               (SELECT count(*) FROM embeddings e2 WHERE e2.label = cnorm.label)
                   AS n_vectors,
               round(centroid_norm, 6) AS centroid_norm,
               (SELECT round(avg(dist), 6) FROM dists d WHERE d.label = cnorm.label)
                   AS avg_dist_to_centroid
        FROM cnorm
    """,
}
