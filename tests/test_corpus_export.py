"""End-to-end corpus export: layout, traceability, idempotence, and
consistency with the verified curation/split stages it composes."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from caseguarddatapipeline_spark.operators.corpus_export import (
    curated_chunks,
    export_training_corpus,
)
from caseguarddatapipeline_spark.operators.curation import e5_corpus_curation

SF = "/root/testdata/sf0.001"


def test_export_layout_and_manifest(spark, tmp_path):
    out = str(tmp_path / "corpus")
    manifest = export_training_corpus(spark, SF, out).collect()
    assert manifest
    # physical layout: split=/lang= partition directories exist
    splits = {d for d in os.listdir(out) if d.startswith("split=")}
    assert "split=train" in splits
    langs = {
        d
        for s in splits
        for d in os.listdir(os.path.join(out, s))
        if d.startswith("lang=")
    }
    assert langs
    # the training reader prunes to split=train only
    train = spark.read.parquet(out).filter(F.col("split") == "train")
    n_train = train.count()
    assert n_train == sum(r["n_chunks"] for r in manifest if r["split"] == "train")
    assert n_train > 0


def test_chunks_trace_to_curated_docs(spark):
    chunks = curated_chunks(spark, SF)
    # chunk fan-out is contiguous per doc: indexes 0..n-1
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("chunk_index").alias("lo"),
            F.max("chunk_index").alias("hi"),
        )
        .collect()
    )
    assert per_doc
    assert all(r["lo"] == 0 and r["hi"] == r["n"] - 1 for r in per_doc)
    # doc count agrees with the oracle-checked curation summary
    n_docs = len(per_doc)
    assert n_docs == sum(
        r["n_docs"] for r in e5_corpus_curation(spark, SF).collect()
    )


def test_export_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "corpus")
    first = {tuple(r) for r in export_training_corpus(spark, SF, out).collect()}
    second = {tuple(r) for r in export_training_corpus(spark, SF, out).collect()}
    assert first == second
