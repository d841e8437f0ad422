"""Headline multi-way-join queries (TPC-H Q5/Q18 shapes): deep join chains
that exercise Catalyst's join reordering, broadcast selection, and AQE.

Q5 shape: 6-way star join (region→nation→customer→orders→lineitem→supplier)
with the co-nation predicate. All dimensions broadcast; the only shuffles
are fact-side aggregation exchanges — at 100 TB the plan is scan-heavy and
shuffle-light, exactly what a star schema wants.

Q18 shape: large-order detection — an aggregate-then-semi-join pattern.
The having-sum subquery result (few keys) broadcasts back against orders;
no full orders×lineitem shuffle join of row payloads.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources import load_table


def q5_regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation inside one region/date window (TPC-H Q5 shape).
    Supplier and customer must share the nation (the Q5 co-location
    predicate)."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    lo = F.to_timestamp_ntz(F.lit("1996-01-01 00:00:00"))
    hi = F.to_timestamp_ntz(F.lit("1997-01-01 00:00:00"))
    dims = (
        nation.join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                    nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    cust = customer.join(F.broadcast(dims), customer.c_nationkey == dims.n_nationkey)
    supp = supplier.join(
        F.broadcast(dims.select(F.col("n_nationkey").alias("s_nkey"))),
        supplier.s_nationkey == F.col("s_nkey"),
    ).select("s_suppkey", "s_nationkey")
    ord_window = orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(ord_window, li.l_orderkey == ord_window.o_orderkey)
        .join(F.broadcast(cust), (F.col("o_custkey") == F.col("c_custkey")))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.round(revenue, 2).alias("revenue"))
        .orderBy(F.desc("revenue"))
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total lineitem quantity exceeds a threshold (TPC-H Q18
    shape): aggregate lineitem first (partial+final on orderkey), keep the
    few qualifying keys, then broadcast-semi-join back to orders+customer."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            "o_totalprice",
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit by supplier nation × order year for one product family
    (TPC-H Q9 shape): a LIKE filter on part prunes the fact side early
    (broadcast semi-reduction), profit expression computed in the join
    projection, then a two-key hash agg. The year comes from the order
    date — a join to orders just for a date column, which column pruning
    reduces to (o_orderkey, o_orderdate)."""
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    green = part.filter(F.col("p_name").contains("a")).select("p_partkey")
    supp_nation = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", "n_name")
    # decimal math: the profit sum spans millions of cents, where double
    # association order flips the last cent between engines; 2dp×2dp
    # decimals sum exactly and order-independently
    profit = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(green), li.l_partkey == green.p_partkey)
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_orderdate"),
              li.l_orderkey == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


QUERIES = {
    "q5_regional_volume": q5_regional_volume,
    "q18_large_orders": q18_large_orders,
    "q9_product_profit": q9_product_profit,
}

ORACLES = {
    "q9_product_profit": """
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                              * (CAST(1 AS DECIMAL(18,2))
                                 - CAST(l_discount AS DECIMAL(18,2)))), 2)
                    AS DOUBLE) AS profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%a%'
        GROUP BY n_name, year(o_orderdate)
        ORDER BY nation, o_year DESC
    """,
    "q5_regional_volume": """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC
    """,
    "q18_large_orders": """
        WITH big AS (
            SELECT l_orderkey, sum(l_quantity) AS total_qty
            FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
        )
        SELECT c_name, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_date,
               o_totalprice,
               round(total_qty, 2) AS total_qty
        FROM orders
        JOIN big ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 100
    """,
}
