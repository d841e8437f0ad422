"""Deterministic-stub inference operators (U1/U2): exact pinned outputs,
repeatability, and embedding invariants."""

from __future__ import annotations

import math

import pandas as pd

from caseguarddatapipeline_spark.operators.inference import (
    EMBED_DIM,
    hash_embed,
    u1_insight_extraction,
    u2_hash_embedding,
)


def test_hash_embed_deterministic_and_normalized():
    texts = pd.Series(["spark join merge", "spark join merge", "other text"])
    out = hash_embed(texts)
    assert list(out[0]) == list(out[1])
    assert list(out[0]) != list(out[2])
    assert len(out[0]) == EMBED_DIM
    norm = math.sqrt(sum(x * x for x in out[0]))
    assert abs(norm - 1.0) < 1e-5


def test_u1_repeatable(spark, sf_dir):
    a = u1_insight_extraction(spark, sf_dir).orderBy("doc_id").limit(20).collect()
    b = u1_insight_extraction(spark, sf_dir).orderBy("doc_id").limit(20).collect()
    assert [str(r) for r in a] == [str(r) for r in b]
    first = a[0]
    assert 0.0 <= first["settlement_likelihood"] <= 1.0
    assert 0.0 <= first["confidence"] <= 1.0
    assert len(first["key_issues"].split(",")) <= 3
    assert len(first["summary"].split(" ")) <= 8


def test_u2_embedding_invariants(spark, sf_dir):
    rows = u2_hash_embedding(spark, sf_dir).limit(50).collect()
    assert all(r["dim"] == EMBED_DIM for r in rows)
    # norm is the RAW bucket-count norm (√Σc² ≥ √n_tokens ≥ 1) and
    # component_sum = Σc/√Σc² ∈ [1, √dim]
    assert all(r["norm"] >= 1.0 for r in rows)
    assert all(1.0 <= r["component_sum"] <= math.sqrt(EMBED_DIM) + 1e-9 for r in rows)
