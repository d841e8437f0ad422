"""End-to-end training-corpus export: the composition a corpus team
actually runs — curation survivors → leakage-safe split → chunk fan-out
→ partitioned parquet — as ONE write job.

This is the engine's top-level user story stitched from verified parts:
the curation stages are e5_corpus_curation's (quality gate, exact dedup,
LSH near-dup removal — operators/curation.py), the split rule is
e5_train_split's content-hash bucketing (re-ingest-stable), the chunker
is u7_embedding_chunks' cap+800-char fan-out (operators/inference.py),
and the sink is S6's partitioned layout (sources/connectors.py:58).

Scale shape: quality/chunking are narrow per-row transforms; the only
shuffles are the two the dedup stages need (exact-dup window, LSH
bucket key) plus the write's partitionBy file fan-out. The output
layout ``split=…/lang=…`` prunes directories for the downstream
training reader (read only ``split=train``), and chunk rows carry
(doc_id, chunk_index) so any chunk traces back to its source document.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources import load_table
from .curation import _curated_docs
from .dedup import _portable_token_hash
from .inference import chunk_explode


def curated_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full transform: curated survivors, split-tagged, chunked.

    Survivors come from curation._curated_docs — the same pipeline the
    oracle-checked e5_corpus_curation summarizes, shared so curation
    semantics cannot drift between the verified query and the export."""
    kept = _curated_docs(spark, sf_dir)

    bucket = F.pmod(_portable_token_hash(F.col("text")), F.lit(1000))
    split = (
        F.when(bucket < 800, F.lit("train"))
        .when(bucket < 900, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    tagged = kept.withColumn("split", split)
    return chunk_explode(tagged, "lang", "quality", "split").select(
        "doc_id",
        "lang",
        "split",
        "chunk_index",
        "chunk_text",
        "n_chars",
        F.round("quality", 6).alias("quality"),
    )


def export_training_corpus(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> DataFrame:
    """Run the pipeline and write ``out_dir/split=…/lang=…`` parquet;
    returns the per-(split, lang) manifest the run reports. Overwrite
    mode keeps the export idempotent (re-running re-asserts the same
    state, T9's property at the corpus level)."""
    chunks = curated_chunks(spark, sf_dir)
    chunks.write.mode("overwrite").partitionBy("split", "lang").parquet(out_dir)
    manifest = (
        spark.read.parquet(out_dir)
        .groupBy("split", "lang")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("split", "lang")
    )
    return manifest
