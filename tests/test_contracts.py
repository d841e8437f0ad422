"""Schema drift detection and snapshot diffing."""

from __future__ import annotations

import pyspark.sql.functions as F

from caseguarddatapipeline_spark.operators.contracts import (
    diff_summary,
    schema_drift,
    snapshot_diff,
)


def test_schema_drift_detects_all_classes(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "x", 2.0)], "id bigint, name string, score double"
    ).write.parquet(path)

    ok = schema_drift(spark, path, "id bigint, name string, score double")
    assert ok["ok"] and not ok["missing"] and not ok["retyped"]

    drift = schema_drift(spark, path, "id bigint, name string, rank int")
    assert not drift["ok"]
    assert drift["missing"] == ["rank"]
    assert drift["unexpected"] == ["score"]

    retyped = schema_drift(spark, path, "id int, name string, score double")
    assert retyped["retyped"] == [("id", "int", "bigint")]


def test_snapshot_diff_classifies(spark, sf_dir):
    from caseguarddatapipeline_spark.sources import load_table

    before = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    # derived "after" snapshot: drop keys %97==0, mutate price %31==0,
    # and add two synthetic rows
    removed = before.filter(F.col("o_orderkey") % 97 == 0)
    changed = before.filter(
        (F.col("o_orderkey") % 31 == 0) & (F.col("o_orderkey") % 97 != 0)
    )
    after = (
        before.filter(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 31 == 0, F.col("o_totalprice") + 1
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            spark.createDataFrame(
                [(10_000_001, "O", 1.0), (10_000_002, "F", 2.0)],
                "o_orderkey bigint, o_orderstatus string, o_totalprice double",
            )
        )
    )
    diff = snapshot_diff(before, after, ["o_orderkey"])
    s = diff_summary(diff)
    assert s["added"] == 2
    assert s["removed"] == removed.count()
    assert s["changed"] == changed.count()
    by_status = {r.o_orderkey: r.status for r in diff.collect()}
    assert by_status[10_000_001] == "added"

    # reflexive: diff(x, x) is empty
    assert snapshot_diff(before, before, ["o_orderkey"]).count() == 0


def test_snapshot_diff_detects_null_shift(spark):
    """A NULL moving between columns must read as 'changed' — Spark's
    hash skips NULL inputs, so the value hash coalesces a sentinel."""
    before = spark.createDataFrame(
        [(1, "Ann", None), (2, "Bob", "bb")],
        "id bigint, first string, nick string",
    )
    after = spark.createDataFrame(
        [(1, None, "Ann"), (2, "Bob", "bb")],
        "id bigint, first string, nick string",
    )
    from caseguarddatapipeline_spark.operators.contracts import snapshot_diff

    diff = {r.id: r.status for r in snapshot_diff(before, after, ["id"]).collect()}
    assert diff == {1: "changed"}
