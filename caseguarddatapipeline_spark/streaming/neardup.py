"""Incremental NEAR-dup detection on a document stream — the streaming
face of the E1 MinHash+LSH family: every micro-batch of newly ingested
documents is signature-hashed once and probed against a persisted
band-signature index, so near-duplicates of ANYTHING seen before are
flagged at ingest time instead of waiting for the next full-corpus
sweep.

Per batch (foreachBatch):
1. the Arrow-vectorized signature kernel (operators/dedup.py
   ``_banded_vectorized`` — same integer arithmetic as the oracle-
   checked batch operator) produces (doc_id, band, band_sig, shingles);
2. candidates = equi-join against the index on (band, band_sig) —
   the posting-list probe, NOT all-pairs; exact Jaccard verifies on the
   carried shingle sets and pairs ≥ the threshold append to ``out_dir``;
3. the batch's own signatures append to the index, partitioned by
   ``band`` so the probe join prunes to matching band directories.

State lives in parquet, not executor memory: the index is re-readable
across restarts. foreachBatch is at-least-once, so each side handles a
replayed batch explicitly: candidate pairs write to
``out_dir/batch_id=N`` with dynamic partition overwrite — a replay
overwrites its own partition, making the pair output exactly-once —
while the index side appends (a replay's duplicate signature rows are
tolerated by the probe's groupBy-max dedupe on (new_doc, index_doc)). At
100 TB-ingest scale the index is additionally bucketed on band_sig so
the per-batch probe is a bucket-pruned merge join, and a TTL compaction
drops signatures past the dedup horizon.

Within-batch pairs are intentionally NOT emitted here — a batch is also
its own near-dup candidate set, and the batch operator
(e1_minhash_lsh_vectorized) covers that; composing both per batch is
one extra call at the foreachBatch site.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import _banded_vectorized, _pair_jaccard

DOC_STREAM_SCHEMA = "doc_id long, text string"

NEARDUP_THRESHOLD = 0.5


def probe_index(banded: DataFrame, index: DataFrame) -> DataFrame:
    """Candidate pairs between a batch's banded signatures and the
    index: bucket equi-join, exact-Jaccard verify, one row per
    (new_doc, index_doc) pair (a pair colliding in several bands
    dedupes)."""
    b = banded.alias("b")
    x = index.alias("x")
    jac = _pair_jaccard(F.col("b.shingles"), F.col("x.shingles"))
    return (
        b.join(
            x,
            (F.col("b.band") == F.col("x.band"))
            & (F.col("b.band_sig") == F.col("x.band_sig"))
            & (F.col("b.doc_id") != F.col("x.doc_id")),
        )
        .select(
            F.col("b.doc_id").alias("new_doc"),
            F.col("x.doc_id").alias("index_doc"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= NEARDUP_THRESHOLD)
        .groupBy("new_doc", "index_doc")
        .agg(F.max("jaccard").alias("jaccard"))
    )


def run_neardup_stream(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 10,
):
    """Drain the document stream (availableNow), flagging near-dups of
    previously indexed documents and growing the index; returns the
    finished query."""
    os.makedirs(index_dir, exist_ok=True)
    os.makedirs(out_dir, exist_ok=True)

    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(input_dir)
    )

    def handle_batch(batch: DataFrame, batch_id: int) -> None:
        sess = batch.sparkSession
        banded = _banded_vectorized(sess, batch.select("doc_id", "text")).persist()
        try:
            try:
                index = sess.read.parquet(index_dir)
                has_index = len(index.columns) > 0
            except Exception:  # first batch: no index yet
                has_index = False
            if has_index:
                (probe_index(banded, index)
                    .withColumn("batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("batch_id")
                    .parquet(out_dir))
            (banded.write.mode("append").partitionBy("band").parquet(index_dir))
        finally:
            banded.unpersist()

    query = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
