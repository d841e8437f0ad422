"""MERGE/watermark semantics (T1/T2/T9): idempotency is the load-bearing
property (change_tracking.py:370-387 in the reference)."""

from __future__ import annotations

import pyspark.sql.functions as F

from caseguarddatapipeline_spark.operators.incremental import merge_upsert
from caseguarddatapipeline_spark.operators.reconcile import (
    crm_snapshot,
    store_snapshot,
)


def _sorted_rows(df):
    return sorted(map(str, df.collect()))


def test_merge_upsert_basic(spark):
    state = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b")], ["id", "serial", "tag"]
    )
    updates = spark.createDataFrame(
        [(2, 25, "b2"), (3, 30, "c")], ["id", "serial", "tag"]
    )
    merged = merge_upsert(state, updates, "id")
    rows = {r["id"]: (r["serial"], r["tag"]) for r in merged.collect()}
    assert rows == {1: (10, "a"), 2: (25, "b2"), 3: (30, "c")}


def test_merge_upsert_idempotent(spark, sf_dir):
    crm = crm_snapshot(spark, sf_dir).select(
        "entity_id",
        F.col("crm_serialno").alias("stored_serialno"),
        F.lit(True).alias("is_active"),
    )
    store = store_snapshot(spark, sf_dir)
    once = merge_upsert(store, crm, "entity_id")
    twice = merge_upsert(once, crm, "entity_id")
    assert _sorted_rows(once) == _sorted_rows(twice)


def test_merge_null_update_preserves_state(spark):
    state = spark.createDataFrame([(1, 10)], ["id", "serial"])
    updates = spark.createDataFrame(
        [(1, None)], schema="id bigint, serial bigint"
    )
    merged = merge_upsert(state, updates, "id")
    assert merged.collect()[0]["serial"] == 10
