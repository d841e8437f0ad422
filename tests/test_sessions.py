"""Sessionization and grouped-map centroid semantics."""

from __future__ import annotations

import pyspark.sql.functions as F

from caseguarddatapipeline_spark.operators.sessions import (
    SESSION_GAP_MIN,
    u6_label_centroids,
    w8_sessionize,
)
from caseguarddatapipeline_spark.sources import load_table


def test_sessionize_known_timeline(spark):
    rows = [
        (1, 1, "2024-01-01 10:00:00", 1.0),
        (1, 2, "2024-01-01 10:20:00", 1.0),   # 20 min gap → same session
        (1, 3, "2024-01-01 11:10:00", 1.0),   # 50 min gap → new session
        (2, 4, "2024-01-01 09:00:00", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_s string, value double"
    ).select("user_id", "event_id", F.to_timestamp("ts_s").alias("ts"), "value")
    df.createOrReplaceTempView("_sess_events")

    import caseguarddatapipeline_spark.operators.sessions as mod
    orig = mod.load_table
    mod.load_table = lambda spark, sf_dir, name: df
    try:
        out = {(r["user_id"], r["session_id"]): r for r in w8_sessionize(spark, "x").collect()}
    finally:
        mod.load_table = orig
    assert out[(1, 1)]["n_events"] == 2 and out[(1, 1)]["duration_min"] == 20.0
    assert out[(1, 2)]["n_events"] == 1
    assert out[(2, 1)]["n_events"] == 1


def test_session_events_conserved(spark, sf_dir):
    total = load_table(spark, sf_dir, "events").count()
    sessions = w8_sessionize(spark, sf_dir)
    assert sessions.agg(F.sum("n_events")).first()[0] == total
    assert sessions.filter(F.col("duration_min") < 0).count() == 0


def test_centroids_cover_labels(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = {r["label"]: r for r in u6_label_centroids(spark, sf_dir).collect()}
    counts = {r["label"]: r["n"] for r in emb.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(out) == set(counts)
    for lab, r in out.items():
        assert r["n_vectors"] == counts[lab]
        assert r["centroid_norm"] > 0
        assert r["avg_dist_to_centroid"] > 0
