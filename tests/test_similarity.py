"""Similarity search invariants: brute-force correctness and IVF recall."""

from __future__ import annotations

from caseguarddatapipeline_spark.operators.similarity import (
    e2_cosine_topk,
    e2_ivf_search,
    e2_knn_per_query,
)


def test_topk_is_sorted_and_bounded(spark, sf_dir):
    rows = e2_cosine_topk(spark, sf_dir).collect()
    assert len(rows) == 10
    cosines = [r["cosine"] for r in rows]
    assert cosines == sorted(cosines, reverse=True)
    assert all(-1.0 <= c <= 1.0 for c in cosines)


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    brute = e2_knn_per_query(spark, sf_dir).collect()
    ivf = e2_ivf_search(spark, sf_dir).collect()
    brute_sets = {}
    for r in brute:
        brute_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    ivf_sets = {}
    for r in ivf:
        ivf_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert set(ivf_sets) == set(brute_sets)
    # k=16 cells, nprobe=4 (~25% of corpus scanned): numpy simulation of the
    # same quantizer gives recall@3 ≈ 0.93; assert a safe floor
    hits = sum(len(ivf_sets[q] & brute_sets[q]) for q in brute_sets)
    total = sum(len(brute_sets[q]) for q in brute_sets)
    assert hits / total >= 0.6, f"IVF recall {hits}/{total}"
