"""Relational layer, part 2: worker metrics, second-level rollups, queue
consumption ordering, listing sorts, cube, distinct-count surface
(A10-A12, W4/W6 + the §2.4 closing note's cube/approx_count_distinct).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources import load_table


def a10_worker_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worker running metrics (etl/worker.py:179-204): processed/successful
    /failed counts and success rate per worker (event_type stands in for
    the worker class; 'error' events are failures)."""
    events = load_table(spark, sf_dir, "events")
    is_fail = F.col("event_type") == "error"
    # The 4dp mean is computed ENTIRELY in integer arithmetic: exact
    # micro-unit sums (values are non-negative currency doubles), then
    # half-up rounding as (2S + 100n) DIV (200n) — because round(double)
    # on a true half-way quotient (e.g. 3148.24/64 = 49.19125) rounds UP
    # in Spark but half-to-even in DuckDB, flipping the driver hash at
    # sf0.1 group sizes. Integer division agrees everywhere.
    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("jobs_processed"),
            F.count(F.when(~is_fail, 1)).alias("jobs_successful"),
            F.count(F.when(is_fail, 1)).alias("jobs_failed"),
            F.sum(
                (F.col("value").cast("decimal(18,6)") * 1000000).cast("long")
            ).alias("s_micro"),
        )
    )
    avg_4dp = (
        F.expr("(2 * s_micro + 100 * jobs_processed) DIV (200 * jobs_processed)")
        .cast("double")
        / 10000.0
    )
    return per_user.select(
        "user_id",
        "jobs_processed",
        "jobs_successful",
        "jobs_failed",
        avg_4dp.alias("avg_processing_value"),
        (
            F.expr(
                "(2 * jobs_successful * 1000000 + jobs_processed)"
                " DIV (2 * jobs_processed)"
            ).cast("double")
            / 1000000.0
        ).alias("success_rate"),
    )


def a12_performance_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-level performance summary (dashboard.py:882-901): aggregate
    the per-(status,priority) group stats again into one overview row —
    an agg over an agg, two cheap shuffles on shrinking data."""
    orders = load_table(spark, sf_dir, "orders")
    groups = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.avg("o_totalprice").alias("avg_price"),
    )
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n_orders").alias("total_orders"),
        F.round(F.avg("avg_price"), 4).alias("avg_group_price"),
        F.round(F.max("avg_price"), 4).alias("max_group_price"),
    )


def w4_priority_consumption_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority-queue consumption order (worker.py:63-68,119-127): the
    first 20 jobs a worker would take — priority 1 before 2 before 3,
    FIFO (key order) within a priority."""
    orders = load_table(spark, sf_dir, "orders")
    jobs = orders.select(
        F.col("o_orderkey").alias("job_id"),
        F.when(F.col("o_orderpriority").startswith("1"), 1)
        .when(F.col("o_orderpriority").startswith("2"), 2)
        .otherwise(3)
        .alias("priority"),
    )
    return jobs.orderBy("priority", "job_id").limit(20)


def w6_listing_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Object-listing sort (technical-details.md:406-434: list objects by
    LastModified): documents listed per source, ordered, first 50."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.orderBy("source", "doc_id")
        .limit(50)
        .select("source", "doc_id", "n_chars")
    )


def a14_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (lang, source-class) — the grouping-sets surface Catalyst
    gives for free (SURVEY.md §2.4 closing note)."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "source_class",
        F.when(F.col("source").isin("src0", "src1", "src2", "src3", "src4"), "low")
        .otherwise("high"),
    )
    return (
        docs.cube("lang", "source_class")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(
            F.coalesce(F.col("lang"), F.lit("ALL")).alias("lang"),
            F.coalesce(F.col("source_class"), F.lit("ALL")).alias("source_class"),
            "n_docs",
            "total_chars",
        )
    )


def a15_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count per event type (dedup's counting face:
    count_distinct over the partial-agg path)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_distinct_users"),
    )


def a16_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct per event type — the 100 TB path
    where exact distinct would shuffle every key. Emitted with the exact
    count and relative error; rows-only (HLL sketches are engine-specific)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact_distinct"),
            F.approx_count_distinct("user_id", rsd=0.05).alias("approx_distinct"),
        )
        .select(
            "event_type",
            "exact_distinct",
            "approx_distinct",
            F.round(
                F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                4,
            ).alias("rel_error"),
        )
    )


QUERIES = {
    "a10_worker_metrics": a10_worker_metrics,
    "a12_performance_summary": a12_performance_summary,
    "w4_priority_consumption_order": w4_priority_consumption_order,
    "w6_listing_sort": w6_listing_sort,
    "a14_cube_counts": a14_cube_counts,
    "a15_distinct_users": a15_distinct_users,
    "a16_approx_distinct_users": a16_approx_distinct_users,
}

ORACLES = {
    "a10_worker_metrics": """
        -- Ratios are half-up-rounded in INTEGER arithmetic ((2k+n) // 2n
        -- scaled): round(double) disagrees across engines on exact
        -- half-way quotients (Spark half-up, DuckDB half-to-even).
        WITH per_user AS (
            SELECT user_id,
                   count(*) AS jobs_processed,
                   count(CASE WHEN event_type <> 'error' THEN 1 END) AS jobs_successful,
                   count(CASE WHEN event_type = 'error' THEN 1 END) AS jobs_failed,
                   sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS s_micro
            FROM events GROUP BY user_id
        )
        SELECT user_id, jobs_processed, jobs_successful, jobs_failed,
               CAST((2 * s_micro + 100 * jobs_processed)
                    // (200 * jobs_processed) AS DOUBLE) / 10000.0
                   AS avg_processing_value,
               CAST((2 * jobs_successful * 1000000 + jobs_processed)
                    // (2 * jobs_processed) AS DOUBLE) / 1000000.0
                   AS success_rate
        FROM per_user
    """,
    "a12_performance_summary": """
        WITH groups AS (
            SELECT o_orderstatus, o_orderpriority,
                   count(*) AS n_orders, avg(o_totalprice) AS avg_price
            FROM orders GROUP BY o_orderstatus, o_orderpriority
        )
        SELECT count(*) AS n_groups,
               CAST(sum(n_orders) AS BIGINT) AS total_orders,
               round(avg(avg_price), 4) AS avg_group_price,
               round(max(avg_price), 4) AS max_group_price
        FROM groups
    """,
    "w4_priority_consumption_order": """
        SELECT o_orderkey AS job_id,
               CASE WHEN o_orderpriority LIKE '1%' THEN 1
                    WHEN o_orderpriority LIKE '2%' THEN 2
                    ELSE 3 END AS priority
        FROM orders
        ORDER BY priority, job_id
        LIMIT 20
    """,
    "w6_listing_sort": """
        SELECT source, doc_id, n_chars FROM documents
        ORDER BY source, doc_id LIMIT 50
    """,
    "a14_cube_counts": """
        WITH d AS (
            SELECT lang,
                   CASE WHEN source IN ('src0','src1','src2','src3','src4')
                        THEN 'low' ELSE 'high' END AS source_class,
                   n_chars
            FROM documents
        )
        SELECT coalesce(lang, 'ALL') AS lang,
               coalesce(source_class, 'ALL') AS source_class,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM d GROUP BY CUBE (lang, source_class)
    """,
    "a15_distinct_users": """
        SELECT event_type, count(*) AS n_events,
               count(DISTINCT user_id) AS n_distinct_users
        FROM events GROUP BY event_type
    """,
    # a16_approx_distinct_users: rows-only (HLL sketch values are
    # engine-specific; the emitted rel_error column bounds the drift).
}
