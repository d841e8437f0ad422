"""Correlated-scalar and disjunctive-predicate shapes (TPC-H Q17/Q19/
Q21/Q22 patterns).

The decorrelation story: Catalyst rewrites each correlated scalar
subquery into an aggregate + equi-join (no per-row re-execution), the
disjunctive part/lineitem predicate into a single post-join filter, and
the EXISTS/NOT-EXISTS pair into one semi- plus one anti-join over the
same shuffled fact — the plan shapes that survive 100 TB. Reference
analogs: per-case threshold checks (etl/reconciliation.py:169-224) and
"no recent activity" anti-joins (etl/flows/sync_daily.py:171-177).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources import load_table


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue from lineitems whose quantity is below 20% of
    the per-part average — a correlated scalar subquery, decorrelated
    into a per-part aggregate broadcast back onto the fact scan."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    brand = part.filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    per_part_avg = (
        li.groupBy("l_partkey").agg((F.avg("l_quantity") * 0.2).alias("qty_cut"))
    )
    return (
        li.join(F.broadcast(brand), li.l_partkey == brand.p_partkey)
        .join(per_part_avg, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: revenue under three OR'd brand/size/quantity band
    predicates. One broadcast join + one disjunctive filter — Catalyst
    pushes the common join key and leaves the OR as a single post-join
    predicate (no union of three scans)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    bands = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15))
         & (F.col("l_quantity").between(1, 11)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 25))
           & (F.col("l_quantity").between(10, 20)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 35))
           & (F.col("l_quantity").between(20, 30)))
    )
    return j.filter(bands).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q21_waiting_orders_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers whose lineitem was the ONLY late one on a
    multi-supplier order — EXISTS (another supplier on the order) AND
    NOT EXISTS (another LATE supplier on the order), as one semi- plus
    one anti-join over the same exploded fact. Late = shipped >60 days
    after order date (stands in for receipt>commit)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")

    lo = li.join(
        orders.select("o_orderkey", "o_orderdate", "o_orderstatus"),
        li.l_orderkey == F.col("o_orderkey"),
    )
    late = lo.filter(
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate").cast("date"), 60)
    ).select("l_orderkey", "l_suppkey")

    other_supp = (
        li.select(F.col("l_orderkey").alias("o_key"), F.col("l_suppkey").alias("o_supp"))
        .distinct()
    )
    # EXISTS: some other supplier on the same order
    has_other = late.join(
        other_supp,
        (late.l_orderkey == other_supp.o_key) & (late.l_suppkey != other_supp.o_supp),
        "left_semi",
    )
    other_late = (
        late.select(F.col("l_orderkey").alias("x_key"), F.col("l_suppkey").alias("x_supp"))
        .distinct()
    )
    # NOT EXISTS: no other LATE supplier on the same order
    sole_late = has_other.join(
        other_late,
        (has_other.l_orderkey == other_late.x_key)
        & (has_other.l_suppkey != other_late.x_supp),
        "left_anti",
    )
    return (
        sole_late.join(supplier, sole_late.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: customers with above-average account balance and no
    RECENT orders (none since 1999) — a scalar-subquery threshold (one
    tiny aggregate broadcast into the filter) plus an anti-join against
    the pre-filtered orders fact. The pushed date filter shrinks the
    anti-join build side before the shuffle."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("cut")
    )
    rich = (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("cut"))
    )
    recent = orders.filter(F.col("o_orderdate") >= F.lit("1999-01-01"))
    dormant = rich.join(
        recent, rich.c_custkey == recent.o_custkey, "left_anti"
    )
    return dormant.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    ).orderBy("c_mktsegment")


QUERIES = {
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q21_waiting_orders_suppliers": q21_waiting_orders_suppliers,
    "q22_dormant_customers": q22_dormant_customers,
}

ORACLES = {
    "q17_small_quantity_revenue": """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
               count(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (
              SELECT 0.2 * avg(i.l_quantity) FROM lineitem i
              WHERE i.l_partkey = lineitem.l_partkey
          )
    """,
    "q19_disjunctive_revenue": """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "q21_waiting_orders_suppliers": """
        WITH late AS (
            SELECT l_orderkey, l_suppkey
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate > CAST(o_orderdate AS DATE) + INTERVAL 60 DAY
        )
        SELECT s_name, count(*) AS numwait
        FROM late t JOIN supplier ON t.l_suppkey = s_suppkey
        WHERE EXISTS (
            SELECT 1 FROM lineitem o
            WHERE o.l_orderkey = t.l_orderkey AND o.l_suppkey <> t.l_suppkey
        )
        AND NOT EXISTS (
            SELECT 1 FROM late x
            WHERE x.l_orderkey = t.l_orderkey AND x.l_suppkey <> t.l_suppkey
        )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC
        LIMIT 20
    """,
    "q22_dormant_customers": """
        SELECT c_mktsegment, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (
            SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '1999-01-01'
        )
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
}
