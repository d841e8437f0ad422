"""T3/T4 crash-recovery (round-11 verdict item 3): kill the jobs stream
MID-RUN — after a batch's effects are written but before its checkpoint
commit, the adversarial replay point — restart from the same
checkpoint, and assert exactly-once EFFECTS end-to-end: every job
completes exactly once, persistent failures reach the DLQ exactly once
with the full retry budget consumed, nothing is lost or duplicated.
This is the reference behavior the worker's requeue loop provides
(etl/worker.py:208-250), driven through a real checkpointed restart."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest
from pyspark.errors.exceptions.captured import StreamingQueryException

from caseguarddatapipeline_spark.streaming.jobs import (
    MAX_RETRIES,
    drain_queue,
    make_batch_handler,
    queue_source,
)

N_JOBS = 30
FAILING = {3, 13, 23}  # persistent failures -> DLQ after MAX_RETRIES


def _write_queue(queue_dir: str) -> None:
    os.makedirs(queue_dir)
    for f in range(6):  # 6 files x 5 jobs; maxFilesPerTrigger=1 -> 6 batches
        with open(os.path.join(queue_dir, f"jobs-{f:03d}.json"), "w") as fh:
            for i in range(5):
                job_id = f * 5 + i
                fh.write(
                    json.dumps(
                        {
                            "job_id": job_id,
                            "entity_id": job_id,
                            "change_type": "update" if job_id % 2 else "new",
                            "priority": 1 + job_id % 3,
                            "retry_count": 0,
                        }
                    )
                    + "\n"
                )


def test_crash_midstream_then_restart_is_exactly_once(spark, tmp_path):
    queue_dir = str(tmp_path / "queue")
    out_dir = str(tmp_path / "out")
    dlq_dir = str(tmp_path / "dlq")
    ckpt = str(tmp_path / "ckpt")
    _write_queue(queue_dir)
    os.makedirs(out_dir)
    os.makedirs(dlq_dir)

    fail_pred = F.col("job_id").isin(*FAILING)
    real_handler = make_batch_handler(queue_dir, out_dir, dlq_dir, fail_pred)

    def crashing_handler(batch, batch_id):
        real_handler(batch, batch_id)
        if batch_id == 1:
            # effects for batch 1 are already on disk; the commit log
            # entry is not — the worst-case crash point: on restart the
            # engine MUST replay batch 1, and the sinks must absorb the
            # replay without duplicating
            raise RuntimeError("injected crash after effects, before commit")

    query = (
        queue_source(spark, "files", queue_dir=queue_dir,
                     max_files_per_trigger=1)
        .writeStream.foreachBatch(crashing_handler)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="injected crash"):
        query.awaitTermination()

    # the crash really was mid-stream: batch 0 and 1 effects are on disk
    # (partial state), later batches never ran
    partial = spark.read.parquet(out_dir)
    done_so_far = partial.count()
    assert 0 < done_so_far < N_JOBS - len(FAILING)
    batches_seen = {r.batch_id for r in partial.select("batch_id").collect()}
    assert batches_seen == {0, 1}

    # restart from the SAME checkpoint; run retry rounds to the DLQ end
    drain_queue(spark, queue_dir, out_dir, dlq_dir, ckpt,
                fail_predicate=fail_pred)

    done = spark.read.parquet(out_dir)
    done_ids = [r.job_id for r in done.select("job_id").collect()]
    assert sorted(done_ids) == sorted(set(range(N_JOBS)) - FAILING), (
        "jobs lost or duplicated across the crash/restart boundary"
    )
    # every completed job exactly once, original retry budget untouched
    assert done.filter(F.col("retry_count") != 0).count() == 0

    dead = spark.read.parquet(dlq_dir)
    dead_ids = [r.job_id for r in dead.select("job_id").collect()]
    assert sorted(dead_ids) == sorted(FAILING), (
        "DLQ lost or duplicated rows across the crash/restart boundary"
    )
    # the full retry budget was consumed exactly once per failing job
    assert {r.retry_count for r in dead.collect()} == {MAX_RETRIES - 1}

    # conservation: every enqueued job is accounted for exactly once
    assert len(done_ids) + len(dead_ids) == N_JOBS


def test_restart_without_crash_reprocesses_nothing(spark, tmp_path):
    """A clean finish followed by another run on the same checkpoint must
    be a no-op (the file source's seen-files log): no new batches, no
    duplicate effects — the property drain_queue's shared checkpoint
    relies on between retry rounds."""
    queue_dir = str(tmp_path / "queue")
    out_dir = str(tmp_path / "out")
    dlq_dir = str(tmp_path / "dlq")
    ckpt = str(tmp_path / "ckpt")
    _write_queue(queue_dir)

    drain_queue(spark, queue_dir, out_dir, dlq_dir, ckpt)
    first = sorted(
        r.job_id for r in spark.read.parquet(out_dir).collect()
    )
    assert first == list(range(N_JOBS))
    drain_queue(spark, queue_dir, out_dir, dlq_dir, ckpt)
    again = sorted(
        r.job_id for r in spark.read.parquet(out_dir).collect()
    )
    assert again == first
