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


def test_neardup_removal_survives_high_dup_corpus(spark):
    """Crawl-heavy shape: most of the corpus is near-identical, so the
    removal set is a large fraction of all docs — the case that made the
    forced-broadcast hint dangerous. The un-hinted anti-join must
    complete and keep exactly one representative per near-dup group."""
    import pyspark.sql.functions as F

    from caseguarddatapipeline_spark.operators.dedup import (
        _band_pairs,
        _banded_vectorized,
    )

    rows = []
    for g in range(200):
        # per-group disjoint vocabulary: no cross-group shingle overlap,
        # so each pair is its own near-dup group
        text = " ".join(f"w{g}x{j}" for j in range(12))
        rows.append((2 * g, text))
        rows.append((2 * g + 1, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = _band_pairs(_banded_vectorized(spark, docs), dedup_pairs=False)
    removals = (
        pairs.filter(F.col("jaccard") >= 0.5)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    kept = docs.join(removals, "doc_id", "left_anti").collect()
    # removal set = 200 docs = 50% of the corpus; exactly the lower id
    # of each pair survives
    assert sorted(r["doc_id"] for r in kept) == [2 * g for g in range(200)]


def test_leakage_safe_split_keeps_clusters_whole(spark, sf_dir):
    """Every near-dup cluster lands WHOLE in one split: members inherit
    the representative's bucket, so no cluster straddles the boundary —
    and at sf0.01 the operator demonstrably moves documents (n_moved>0)."""
    import pyspark.sql.functions as F

    from caseguarddatapipeline_spark.operators.curation import (
        e5_leakage_safe_split,
    )
    from caseguarddatapipeline_spark.operators.dedup import (
        _portable_token_hash,
        e1_dedup_clusters,
    )
    from caseguarddatapipeline_spark.sources import load_table

    sf01 = sf_dir.replace("sf0.001", "sf0.01")
    # structural property at both sfs: per-cluster split cardinality == 1
    for d in (sf_dir, sf01):
        docs = load_table(spark, d, "documents").select("doc_id", "text")
        clusters = e1_dedup_clusters(spark, d).select("doc_id", "cluster_id")
        hashes = docs.select(
            F.col("doc_id").alias("h_id"),
            F.pmod(_portable_token_hash(F.col("text")), F.lit(1000)).alias(
                "bucket"
            ),
        )
        assigned = clusters.join(
            hashes, clusters.cluster_id == hashes.h_id
        ).select(
            "cluster_id",
            F.when(F.col("bucket") < 800, "train")
            .when(F.col("bucket") < 900, "val")
            .otherwise("test")
            .alias("split"),
        )
        per_cluster = assigned.groupBy("cluster_id").agg(
            F.count_distinct("split").alias("n_splits")
        )
        assert per_cluster.filter(F.col("n_splits") > 1).count() == 0

        summary = e5_leakage_safe_split(spark, d)
        rows = {r["split"]: r for r in summary.collect()}
        assert sum(r["n_docs"] for r in rows.values()) == docs.count()
    # the fix does real work on the planted near-dups at sf0.01
    assert sum(r["n_moved"] for r in rows.values()) > 0
