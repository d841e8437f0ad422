"""Graph-ANN prototype (round 9): beam-search invariants and the pinned
recall companion backing the graph-vs-IVF decision record
(operators/graphann.py module docstring, GRAPHANN.json)."""

from __future__ import annotations


def test_graph_search_shape_and_determinism(spark, sf_dir):
    from caseguarddatapipeline_spark.operators.graphann import (
        GRAPH_TOPK,
        e2_graph_search,
    )

    rows = e2_graph_search(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q, members in by_q.items():
        # a query never returns itself; ranks are contiguous from 1
        assert all(r.vec_id != q for r in members)
        assert sorted(r.rank for r in members) == list(
            range(1, len(members) + 1)
        )
        assert len(members) <= GRAPH_TOPK
        # ranks follow (cosine desc, vec_id asc) exactly
        ordered = sorted(members, key=lambda r: (-r.cosine, r.vec_id))
        assert [r.rank for r in ordered] == list(range(1, len(members) + 1))
    # two plan builds give identical results (deterministic end-to-end)
    again = e2_graph_search(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_graph_recall_pinned(spark, sf_dir):
    """The measured-recall companion every ANN tier in this engine
    carries (e2_pq_recall pattern). The pinned floor is the measured
    plateau, not a quality promise: on this corpus (isotropic
    pseudo-random 64-d vectors — mean pairwise cosine ≈ 0, no label
    clusters) graph navigation degrades with corpus size by design
    (measured best-first recall@3: 0.67 at sf0.001, 0.87 at sf0.01,
    0.13 at sf0.1), which is the quantitative half of the
    graph-vs-IVF decision record (GRAPHANN.json, graphann.py module
    docstring). If the build or beam mechanics regress, this floor
    trips; if the corpus generator changes, re-measure and re-pin."""
    from caseguarddatapipeline_spark.operators.graphann import e2_graph_recall

    r = e2_graph_recall(spark, sf_dir).collect()[0]
    assert r.n_exact == 15  # 5 queries x top-3
    assert r.n_common <= min(r.n_exact, r.n_graph)
    assert r.recall >= 0.6, f"graph recall@3 regressed: {r.recall}"


def test_blocked_build_degree_bound(spark, sf_dir):
    """The scale-path blocked build caps out-degree at R and never pairs
    across buckets (per-task work bounded by the largest bucket)."""
    import pyspark.sql.functions as F

    from caseguarddatapipeline_spark.operators.graphann import (
        GRAPH_R,
        build_knn_graph_blocked,
    )
    from caseguarddatapipeline_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    g = build_knn_graph_blocked(emb, n_buckets=4)
    deg = g.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    assert deg.agg(F.max("d")).collect()[0][0] <= GRAPH_R
    # same-bucket constraint: every edge's endpoints share the hash bucket
    bkt = emb.select(
        "vec_id", F.pmod(F.xxhash64(F.col("vec_id")), F.lit(4)).alias("b")
    )
    joined = (
        g.join(bkt.withColumnRenamed("vec_id", "src").withColumnRenamed("b", "b_src"), "src")
        .join(bkt.withColumnRenamed("vec_id", "dst").withColumnRenamed("b", "b_dst"), "dst")
    )
    assert joined.filter(F.col("b_src") != F.col("b_dst")).count() == 0


def test_blocked_build_arrow_matches_hof(spark, sf_dir):
    """The Arrow matmul build (the 2 M-corpus route in
    tools/graph_ann_probe.py) is edge-identical to the HOF form — same
    6dp rounding, same (cos desc, dst asc) rank key."""
    from caseguarddatapipeline_spark.operators.graphann import (
        build_knn_graph_blocked,
    )
    from caseguarddatapipeline_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    hof = build_knn_graph_blocked(emb, n_buckets=4).collect()
    arrow = build_knn_graph_blocked(emb, n_buckets=4, use_arrow=True).collect()
    assert sorted(map(tuple, hof)) == sorted(map(tuple, arrow))


def test_graph_recall_envelope_warns_beyond_safe_size(spark, caplog):
    """Round-10 guard (round-11: via logging, so EVERY oversized
    invocation warns — the default ``warnings`` filter would dedupe per
    call site): at sf0.1 (2 000 vectors — beyond GRAPH_RECALL_SAFE_N)
    the export faces must WARN that results are correctness-checked but
    not recall-adequate, and the measured degradation (recall@3 ≈ 0.13
    at this size) stays pinned so the decision evidence can't silently
    drift. Inside the envelope (sf0.001) no warning fires; with the
    guard disabled (plan-only audit mode) no eager job or warning
    happens at all."""
    import logging

    from caseguarddatapipeline_spark.operators import graphann

    with caplog.at_level(logging.WARNING, logger=graphann.__name__):
        r = graphann.e2_graph_recall(spark, "/root/testdata/sf0.1").collect()[0]
        first = sum("recall envelope" in m for m in caplog.messages)
        assert first == 1
        # a SECOND oversized invocation warns again (no per-site dedupe)
        graphann.e2_graph_recall(spark, "/root/testdata/sf0.1")
        assert sum("recall envelope" in m for m in caplog.messages) == 2
    assert r.recall < 0.5, (
        "degradation evidence drifted — re-measure GRAPHANN.json and "
        f"re-pin (got {r.recall})"
    )
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger=graphann.__name__):
        graphann.e2_graph_recall(spark, "/root/testdata/sf0.001").collect()
        assert not any("recall envelope" in m for m in caplog.messages)
        # audit mode: guard gated out — no warning even oversized
        graphann.RECALL_GUARD_ENABLED = False
        try:
            graphann.e2_graph_recall(spark, "/root/testdata/sf0.1")
        finally:
            graphann.RECALL_GUARD_ENABLED = True
        assert not any("recall envelope" in m for m in caplog.messages)
