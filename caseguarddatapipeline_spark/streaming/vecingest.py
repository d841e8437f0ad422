"""Streaming vector-index ingestion: the reference's per-case Pinecone
upsert (etl/flows/process_case.py:292-318 — every processed case pushes its
embedding records) as a Structured Streaming drain into the materialized
postings store (operators/vecindex.py).

Protocol, consistent with the repo's other batch-id-keyed state sinks
(streaming/neardup.py, streaming/drift.py):

- each micro-batch is reduced to ONE record per vec_id (last writer wins by
  event ``ts``, ties broken by a content hash so replay is deterministic),
  then applied with ``ivf_postings_upsert`` — one new immutable version per
  micro-batch, so a reader mid-search never observes a half-applied batch
  and the (base_dir, version) pair a training run records stays exact.
- an ``_INGEST_BATCH`` marker (tmp + atomic replace) records a CHECKPOINT
  IDENTITY token (hash of the checkpoint path) alongside the last applied
  batch id, AFTER its version published. Ownership gate: a marker written
  by a DIFFERENT checkpoint fails fast regardless of batch id — batch ids
  from two checkpoints are incomparable, and the old id-only gate let a
  fresh checkpoint whose batch 0 collided with the marker silently DROP
  genuinely new batch-0 data as a "replay". Within the owning checkpoint:
  a marker AHEAD of the current batch id still fails fast (checkpoint was
  rolled back under a live store); a marker EQUAL to the batch id is the
  crash-replay case with the publish already durable, so the batch is
  skipped; publish-done-marker-lost re-applies the batch, which is
  content-idempotent (same ids, same last-writer-wins outcome) and only
  costs one redundant version.
"""

from __future__ import annotations

import hashlib
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

VEC_STREAM_SCHEMA = "vec_id long, embedding array<double>, ts long"

_MARKER = "_INGEST_BATCH"


def _checkpoint_token(checkpoint_dir: str) -> str:
    return hashlib.sha1(
        os.path.abspath(checkpoint_dir).encode()
    ).hexdigest()[:12]


def _read_marker(base_dir: str) -> tuple[str | None, int]:
    """(checkpoint token, last applied batch id); (None, -1) ONLY when the
    marker file does not exist (a fresh store). A legacy id-only marker
    reads as token ``"legacy"`` so it can never silently match a live
    checkpoint's token; a marker whose batch-id tail is not an integer
    RAISES — a truncated or garbled marker means the store's ownership
    and replay state are unknown, and treating it as "unset" would
    disable both the checkpoint-ownership gate and the rollback gate and
    let the next batch silently overwrite it (round-8 advice fix)."""
    path = os.path.join(base_dir, _MARKER)
    try:
        with open(path) as fh:
            raw = fh.read().strip()
    except FileNotFoundError:
        return None, -1
    tok, sep, n = raw.rpartition(":")
    try:
        return (tok if sep else "legacy"), int(n)
    except ValueError:
        raise RuntimeError(
            f"postings store marker {path} is unparseable ({raw!r}): the "
            "store's ownership/replay state is unknown — refusing to treat "
            "it as fresh; inspect or remove the marker after verifying the "
            "store's contents"
        ) from None


def _write_marker(base_dir: str, token: str, batch_id: int) -> None:
    path = os.path.join(base_dir, _MARKER)
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "w") as fh:
        fh.write(f"{token}:{batch_id}")
    os.replace(tmp, path)


def run_vector_upsert_stream(
    spark: SparkSession,
    sf_dir: str,
    input_dir: str,
    checkpoint_dir: str,
    base_dir: str | None = None,
    max_files_per_trigger: int = 10,
):
    """Drain JSON vector records (``VEC_STREAM_SCHEMA``) from ``input_dir``
    into the postings store with Trigger.AvailableNow; returns the finished
    query. Malformed rows (null id or embedding) divert rather than failing
    the micro-batch."""
    from ..operators.vecindex import (
        _ensure_postings,
        ivf_postings_upsert,
    )

    base = _ensure_postings(spark, sf_dir, base_dir)
    ck_token = _checkpoint_token(checkpoint_dir)

    def handle_batch(batch: DataFrame, batch_id: int) -> None:
        marker_token, applied = _read_marker(base)
        if marker_token is not None and marker_token != ck_token:
            raise RuntimeError(
                f"postings store {base} was last written by checkpoint "
                f"{marker_token}, not this stream's {ck_token}: this "
                "stream's checkpoint does not own this store (fresh "
                "checkpoint against an existing store?) — point at an "
                "empty store or restore the matching checkpoint"
            )
        if applied > batch_id:
            raise RuntimeError(
                f"postings store {base} was last written by batch {applied}, "
                f"ahead of batch {batch_id}: this stream's checkpoint does "
                "not own this store (checkpoint rolled back under a live "
                "store?) — point at an empty store or restore the matching "
                "checkpoint"
            )
        if applied == batch_id:
            return  # replay of a fully-applied batch: publish is durable
        admissible = batch.filter(
            F.col("vec_id").isNotNull() & F.col("embedding").isNotNull()
        )
        # the emptiness probe runs on the PRE-window frame (a limit-1 scan
        # of the micro-batch) so the row_number dedup is computed exactly
        # once, inside the upsert's single evaluation
        if admissible.isEmpty():
            _write_marker(base, ck_token, batch_id)
            return
        w = Window.partitionBy("vec_id").orderBy(
            F.desc("ts"), F.desc(F.md5(F.to_json(F.struct("embedding"))))
        )
        latest = (
            admissible.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("vec_id", "embedding")
        )
        ivf_postings_upsert(batch.sparkSession, sf_dir, latest, base_dir=base)
        _write_marker(base, ck_token, batch_id)

    stream = (
        spark.readStream.schema(VEC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(input_dir)
    )
    query = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
