"""Replicated-scale end-to-end flow drive: onboard a 20k-case tenant,
drain the backlog, and run the daily sync against a 10×-replicated
store — proving the distributed queue writer's rename protocol and the
numbering determinism hold under real volume (byte-stable queue contents
across a re-run), not just on the 25-row fixtures."""

from __future__ import annotations

import json
import os

import pytest

from caseguarddatapipeline_spark.flows import (
    onboard_tenant,
    process_case_backlog,
    sync_tenant_daily,
)

N_CASES = 20_000
BATCH = 250  # → 80 queue files, each renamed out of its staging partition

# customer-key replica offset must preserve c_custkey mod {11, 3, 7} (the
# synthesized store-state classes) so every replica reconciles exactly
# like its base entity: lcm(11, 3, 7) = 231
_MOD_LCM = 231


def _queue_bytes(queue_dir: str) -> dict[str, bytes]:
    out = {}
    for f in sorted(os.listdir(queue_dir)):
        if f.endswith(".json"):
            with open(os.path.join(queue_dir, f), "rb") as fh:
                out[f] = fh.read()
    return out


@pytest.mark.slow
def test_onboard_and_drain_at_volume(spark, tmp_path):
    """20k cases → 80 batch files written by executors and renamed by the
    driver; a re-run reproduces every file byte-for-byte (range
    partitioning pinned by the persist, deterministic numbering), and the
    backlog drain processes every job exactly once."""
    csv = tmp_path / "cases.csv"
    with open(csv, "w") as fh:
        fh.write("Solicitor Reference,Status,Client,Handler,Date Opened\n")
        for i in range(N_CASES):
            status = "Active" if i % 5 else "Complete"
            fh.write(
                f"NBC{i:06d}.001,{status},Client {i},Handler H,01/02/2024\n"
            )
    queue = str(tmp_path / "queue")

    report = onboard_tenant(spark, str(csv), queue, batch_size=BATCH)
    assert report["final_status"] == "completed"
    assert report["jobs_queued"] == N_CASES
    assert report["queuing_results"]["batches_written"] == N_CASES // BATCH
    first = _queue_bytes(queue)
    assert len(first) == N_CASES // BATCH
    # every batch file holds exactly BATCH job lines in job_id order
    for body in first.values():
        lines = body.decode().splitlines()
        assert len(lines) == BATCH
        ids = [json.loads(ln)["job_id"] for ln in lines]
        assert ids == sorted(ids)

    # re-run: byte-stable queue (the rename protocol + numbering are
    # deterministic at volume — the property a re-triggered onboard needs
    # to not double-enqueue)
    report2 = onboard_tenant(spark, str(csv), queue, batch_size=BATCH)
    assert report2["jobs_queued"] == N_CASES
    assert _queue_bytes(queue) == first

    # drain the backlog: every job lands in out exactly once, none dead
    out, dlq, ck = (
        str(tmp_path / "out"), str(tmp_path / "dlq"), str(tmp_path / "ck"),
    )
    process_case_backlog(spark, queue, out, dlq, ck)
    done = spark.read.parquet(out)
    assert done.count() == N_CASES
    assert done.select("job_id").distinct().count() == N_CASES
    assert not os.path.isdir(dlq) or not [
        f for f in os.listdir(dlq) if not f.startswith(("_", "."))
    ]


@pytest.mark.slow
def test_daily_sync_at_replicated_volume(spark, sf_dir, tmp_path):
    """Daily sync on a 10×-replicated store: replica key offsets preserve
    the mod-class store synthesis, so every change-type bucket scales
    exactly 10× and the quality gate decides identically to the base run;
    when it passes, the enqueued file is byte-stable across a re-run."""
    import pyspark.sql.functions as F

    from caseguarddatapipeline_spark.sources import load_table

    n = 10
    big = tmp_path / "sf_rep"
    big.mkdir()
    cust = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    max_cust = cust.agg(F.max("c_custkey")).collect()[0][0]
    off = ((max_cust // _MOD_LCM) + 1) * _MOD_LCM
    max_event = events.agg(F.max("event_id")).collect()[0][0] + 1
    reps = F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("rep")
    (
        cust.select("*", reps)
        .withColumn("c_custkey", F.col("c_custkey") + F.col("rep") * off)
        .drop("rep")
        .write.parquet(str(big / "customer.parquet"))
    )
    (
        events.select("*", reps)
        .withColumn("user_id", F.col("user_id") + F.col("rep") * off)
        .withColumn("event_id", F.col("event_id") + F.col("rep") * F.lit(max_event))
        .drop("rep")
        .write.parquet(str(big / "events.parquet"))
    )

    base = sync_tenant_daily(spark, sf_dir)
    queue = str(tmp_path / "queue")
    rep = sync_tenant_daily(spark, str(big), queue)
    assert rep["final_status"] == "completed"
    for ct, stats in base["summary"].items():
        assert rep["summary"][ct]["n_entities"] == n * stats["n_entities"], ct
    # identical per-entity outcomes ⇒ identical rates ⇒ identical gate
    assert (
        rep["quality"]["quality_ok"] == base["quality"]["quality_ok"]
    )
    if rep["quality"]["quality_ok"]:
        assert rep["jobs_queued"] == n * base["jobs_queued"]
        qfile = os.path.join(queue, rep["queue_file"])
        with open(qfile, "rb") as fh:
            body1 = fh.read()
        rep2 = sync_tenant_daily(spark, str(big), queue)
        assert rep2["queue_file"] == rep["queue_file"]
        with open(qfile, "rb") as fh:
            assert fh.read() == body1
