"""Right-to-be-forgotten purge: anti-join rewrite with audit, idempotent."""

from __future__ import annotations

import pyspark.sql.functions as F

from caseguarddatapipeline_spark.operators.forget import (
    purge_entities,
    purge_report,
)


def _seed(spark, path, n=100):
    spark.range(n).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 7).alias("val"),
    ).write.mode("overwrite").parquet(path)


def test_purge_removes_only_target_rows(spark, tmp_path):
    path = str(tmp_path / "events")
    _seed(spark, path)
    audit = purge_entities(spark, path, "user_id", [3, 5, 9])
    assert audit["n_before"] == 100
    assert audit["n_purged"] == 3
    assert audit["n_after"] == 97
    left = {r.user_id for r in spark.read.parquet(path).collect()}
    assert left.isdisjoint({3, 5, 9}) and len(left) == 97

    # idempotent: purging the same keys again is a no-op
    audit2 = purge_entities(spark, path, "user_id", [3, 5, 9])
    assert audit2["n_purged"] == 0


def test_purge_with_dataframe_keys_and_report(spark, tmp_path):
    p1, p2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    _seed(spark, p1, 50)
    _seed(spark, p2, 80)
    keys = spark.range(10).select(F.col("id").alias("user_id"))
    audits = [
        purge_entities(spark, p1, "user_id", keys),
        purge_entities(spark, p2, "user_id", keys),
    ]
    report = purge_report(audits)
    assert report["tables"] == 2
    assert report["total_purged"] == 20
    assert min(r.user_id for r in spark.read.parquet(p1).collect()) == 10
