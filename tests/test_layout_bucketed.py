"""Bucketed storage layout (round 9, s15): the coded form of every
"bucketed at 100 TB" posture — prove the exchange actually disappears,
not just that the answer is right."""

from __future__ import annotations

import pyspark.sql.functions as F


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_agg_and_join_have_no_exchange(spark, sf_dir):
    """The per-key aggregate over the bucketed fact and the co-bucketed
    fact-fact join must plan with ZERO runtime Exchange — the shuffle
    moved into the one-time bucketed write."""
    from caseguarddatapipeline_spark.operators.layout import (
        bucketed_table,
        s15_bucketed_colocation,
    )

    li = spark.table(bucketed_table(spark, sf_dir, "lineitem", "l_orderkey"))
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = _executed(agg)
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan, plan

    joined = s15_bucketed_colocation(spark, sf_dir)
    jplan = _executed(joined)
    # neither the per-order aggregate nor the orders join may SHUFFLE
    # (a BroadcastExchange of the tiny big-orders side is fine); the
    # only hash-partitioning exchange allowed in the whole query is the
    # final groupBy(o_orderstatus)
    import re

    shuffles = re.findall(r"Exchange hashpartitioning\(([^,]+)", jplan)
    assert len(shuffles) <= 1, jplan
    assert all(s.startswith("o_orderstatus") for s in shuffles), jplan


def test_bucketed_results_match_raw(spark, sf_dir):
    """Bucketing is physical layout only: the s15 result equals the same
    algebra over the raw tables, row for row."""
    from caseguarddatapipeline_spark.operators.layout import (
        s15_bucketed_colocation,
    )
    from caseguarddatapipeline_spark.sources import load_table

    got = {
        r.o_orderstatus: (r.n_orders, r.revenue, r.total_qty)
        for r in s15_bucketed_colocation(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 100)
    )
    exp = {
        r.o_orderstatus: (r.n_orders, r.revenue, r.total_qty)
        for r in orders.join(big, orders.o_orderkey == big.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.round(F.sum("total_qty"), 2).alias("total_qty"),
        )
        .collect()
    }
    assert got == exp


def test_bucketed_table_reuses_registration(spark, sf_dir):
    from caseguarddatapipeline_spark.operators.layout import bucketed_table

    t1 = bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
    t2 = bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
    assert t1 == t2
    assert spark.catalog.tableExists(t1)
