"""Golden-path end-to-end pipeline test, mirroring the reference's
4-stage complete-pipeline test (tests/end_to_end/
test_complete_pipeline_nbc200993.py:23-114: data_ingestion →
ai_enrichment → document_processing → vectorization, asserting each step
completes with output). Here the stages are the engine's own operators
chained on the driver tables."""

from __future__ import annotations

import pyspark.sql.functions as F

from caseguarddatapipeline_spark.operators.inference import (
    u1_insight_extraction,
    u2_hash_embedding,
    u3_text_extraction,
)
from caseguarddatapipeline_spark.operators.reconcile import reconcile_fused
from caseguarddatapipeline_spark.operators.similarity import e2_knn_per_query
from caseguarddatapipeline_spark.sources import load_table
from caseguarddatapipeline_spark.streaming.jobs import jobs_from_reconciliation


def test_complete_pipeline(spark, sf_dir):
    steps_completed = set()

    # 1. data ingestion: scan + reconcile upstream vs store
    detail = reconcile_fused(spark, sf_dir)
    n_entities = detail.count()
    assert n_entities > 0
    types = {r["change_type"] for r in detail.select("change_type").distinct().collect()}
    assert types == {"new", "deactivated", "update", "unchanged"}
    steps_completed.add("data_ingestion")

    # 2. job derivation: changed entities become prioritized work
    jobs = jobs_from_reconciliation(detail)
    n_jobs = jobs.count()
    assert 0 < n_jobs < n_entities  # only changed entities enqueue
    steps_completed.add("job_planning")

    # 3. enrichment + document processing: insight + text extraction stubs
    insights = u1_insight_extraction(spark, sf_dir)
    assert insights.filter(
        (F.col("settlement_likelihood") < 0) | (F.col("settlement_likelihood") > 1)
    ).count() == 0
    extracted = u3_text_extraction(spark, sf_dir)
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert insights.count() == n_docs and extracted.count() == n_docs
    steps_completed.add("ai_enrichment")
    steps_completed.add("document_processing")

    # 4. vectorization + retrieval: embeddings sane, kNN answers
    emb_stats = u2_hash_embedding(spark, sf_dir)
    # raw-count norm: ≥1 always, and component_sum/norm ∈ [1, √dim]
    assert emb_stats.filter(F.col("norm") < 1.0).count() == 0
    assert emb_stats.filter(
        (F.col("component_sum") < 1.0) | (F.col("component_sum") > 8.0)
    ).count() == 0
    knn = e2_knn_per_query(spark, sf_dir)
    assert knn.groupBy("query_id").count().filter(F.col("count") != 3).count() == 0
    steps_completed.add("vectorization")

    assert steps_completed == {
        "data_ingestion",
        "job_planning",
        "ai_enrichment",
        "document_processing",
        "vectorization",
    }


def test_flagship_with_observed_metrics(spark, sf_dir):
    """df.observe: accounting metrics ride on the real query for free —
    no second scan — and surface after the action (the batch analog of
    the streaming HealthListener)."""
    from pyspark.sql import Observation

    obs = Observation("recon_metrics")
    detail = reconcile_fused(spark, sf_dir).observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("change_type") == "update", 1)).alias("n_updates"),
    )
    summary = detail.groupBy("change_type").count()
    rows = {r["change_type"]: r["count"] for r in summary.collect()}
    got = obs.get
    assert got["n_rows"] == sum(rows.values())
    assert got["n_updates"] == rows.get("update", 0)
