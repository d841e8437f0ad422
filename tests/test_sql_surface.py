"""Raw SQL surface: register_temp_views exposes every table to spark.sql,
and SQL results match the DataFrame-API operators."""

from __future__ import annotations

import pyspark.sql.functions as F

from caseguarddatapipeline_spark.catalog import build_catalog
from caseguarddatapipeline_spark.sources import load_table, register_temp_views

QUERIES, _ = build_catalog()


def test_sql_matches_dataframe_api(spark, sf_dir):
    register_temp_views(spark, sf_dir)
    sql = spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_cases,
               round(avg(o_totalprice), 4) AS avg_value
        FROM orders GROUP BY o_orderstatus, o_orderpriority
        """
    )
    api = QUERIES["a8_status_distribution"](spark, sf_dir)
    assert sorted(map(tuple, sql.collect())) == sorted(map(tuple, api.collect()))


def test_sql_join_over_views(spark, sf_dir):
    register_temp_views(spark, sf_dir)
    out = spark.sql(
        """
        SELECT n_name, count(*) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_customers DESC, n_name LIMIT 5
        """
    ).collect()
    assert len(out) == 5
    total = load_table(spark, sf_dir, "customer").count()
    assert sum(r["n_customers"] for r in out) <= total


def test_partition_pruning_reaches_scan(spark, sf_dir, tmp_path):
    from caseguarddatapipeline_spark.sources.connectors import (
        read_partition,
        write_partitioned,
    )

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "part")
    write_partitioned(orders, path, "o_orderstatus")
    pruned = read_partition(spark, path, o_orderstatus="F")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "o_orderstatus" in plan.split("PartitionFilters")[1].split("]")[0], plan
    assert pruned.count() == orders.filter(F.col("o_orderstatus") == "F").count()
