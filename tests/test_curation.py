"""Corpus-curation pipeline: funnel invariants and cross-view consistency."""

from __future__ import annotations

from caseguarddatapipeline_spark.operators.curation import (
    e5_corpus_curation,
    e5_curation_funnel,
)

SF = "/root/testdata/sf0.001"


def test_funnel_is_monotone(spark):
    row = e5_curation_funnel(spark, SF).collect()[0]
    assert row["n_input"] >= row["n_quality"] >= row["n_exact_unique"] >= row["n_final"]
    assert row["n_final"] > 0
    # the quality stage must actually prune something on this corpus
    assert row["n_quality"] < row["n_input"]


def test_summary_matches_funnel(spark):
    funnel = e5_curation_funnel(spark, SF).collect()[0]
    summary = e5_corpus_curation(spark, SF).collect()
    assert sum(r["n_docs"] for r in summary) == funnel["n_final"]
    assert all(0.5 <= r["avg_quality"] <= 1.0 for r in summary)
