"""Subquery shapes: EXISTS / NOT EXISTS (TPC-H Q4/Q16 patterns).

Catalyst plans correlated EXISTS as a left-semi join and NOT EXISTS as a
left-anti join — no per-row subquery execution, one shuffle on the
correlation key (or none when the filtered inner side broadcasts).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources import load_table


def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders in one quarter having AT LEAST ONE late lineitem
    (commitdate-style: shipdate after orderdate + 60 days stands in),
    counted per priority — the Q4 EXISTS shape as a semi-join."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    window = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    late = (
        li.join(
            window.select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate").cast("date"), 60))
        .select(F.col("l_orderkey").alias("late_key"))
        .distinct()
    )
    return (
        window.join(late, window.o_orderkey == late.late_key, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier count per part brand/size for parts NOT supplied
    in any high-tax lineitem (NOT EXISTS → anti-join), Q16's shape:
    anti-join + count_distinct aggregation."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    high_tax_parts = (
        li.filter(F.col("l_tax") > 0.07).select(F.col("l_partkey").alias("ht_key")).distinct()
    )
    eligible = part.join(
        high_tax_parts, part.p_partkey == F.col("ht_key"), "left_anti"
    )
    suppliers_of = li.select("l_partkey", "l_suppkey")
    return (
        eligible.join(suppliers_of, eligible.p_partkey == suppliers_of.l_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("n_suppliers"))
        .orderBy(F.desc("n_suppliers"), F.asc("p_brand"), F.asc("p_size"))
        .limit(50)
    )


QUERIES = {
    "q4_order_priority_check": q4_order_priority_check,
    "q16_supplier_part_counts": q16_supplier_part_counts,
}

ORACLES = {
    "q4_order_priority_check": """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate <  TIMESTAMP '1996-10-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q16_supplier_part_counts": """
        SELECT p_brand, p_size,
               count(DISTINCT l_suppkey) AS n_suppliers
        FROM part JOIN lineitem ON p_partkey = l_partkey
        WHERE NOT EXISTS (
            SELECT 1 FROM lineitem h
            WHERE h.l_partkey = p_partkey AND h.l_tax > 0.07
        )
        GROUP BY p_brand, p_size
        ORDER BY n_suppliers DESC, p_brand ASC, p_size ASC
        LIMIT 50
    """,
}
