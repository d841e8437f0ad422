"""Source/sink connectors (S1/S6/S13) — CSV canonical mapping, partitioned
layout with pruning, metrics export round-trips."""

from __future__ import annotations

import pyspark.sql.functions as F

from caseguarddatapipeline_spark.sources import load_table
from caseguarddatapipeline_spark.sources.connectors import (
    csv_case_scan,
    export_metrics,
    read_partition,
    write_partitioned,
)

CSV_CONTENT = """Borrower Company,Claim ATE Reference,Solicitor Reference,Status,Date Opened
Acme Ltd,ATE001,NBC200993.001,Active,18/09/2024
Beta LLP,ATE002,NBC200994.001,Complete,2024-01-05
Gamma Co,ATE003,NBC200995.001,Active,31/12/2023
"""


def test_csv_case_scan(spark, tmp_path):
    p = tmp_path / "cases.csv"
    p.write_text(CSV_CONTENT)
    df = csv_case_scan(spark, str(p))
    rows = {r["case_ref"]: r for r in df.collect()}
    assert set(rows) == {"NBC200993.001", "NBC200994.001", "NBC200995.001"}
    assert rows["NBC200993.001"]["is_active"] is True
    assert rows["NBC200994.001"]["is_active"] is False
    assert str(rows["NBC200993.001"]["date_opened"]) == "2024-09-18"
    assert str(rows["NBC200994.001"]["date_opened"]) == "2024-01-05"
    assert str(rows["NBC200995.001"]["date_opened"]) == "2023-12-31"


def test_partitioned_layout_roundtrip(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "layout")
    write_partitioned(orders, path, "o_orderstatus")
    sub = read_partition(spark, path, o_orderstatus="F")
    assert sub.count() == orders.filter(F.col("o_orderstatus") == "F").count()
    # partition pruning visible in the physical plan
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "o_orderstatus" in plan


def test_export_metrics(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    metrics = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    jpath = str(tmp_path / "m_json")
    cpath = str(tmp_path / "m_csv")
    export_metrics(metrics, jpath, "json")
    export_metrics(metrics, cpath, "csv")
    jread = spark.read.json(jpath)
    cread = spark.read.option("header", "true").csv(cpath)
    assert jread.count() == metrics.count()
    assert cread.count() == metrics.count()
    assert set(jread.columns) == {"o_orderstatus", "n"}


def test_default_driver_mem_is_bounded():
    """The driver-heap default derives from physical RAM: never below 2g
    (tiny CI runner), never above the measured 24g stress requirement,
    and always a parseable <N>g string."""
    from caseguarddatapipeline_spark.session import _default_driver_mem

    val = _default_driver_mem()
    assert val.endswith("g")
    n = int(val[:-1])
    assert 2 <= n <= 24
