"""Streaming PSI drift monitor: per-batch scoring of the cumulative
event histogram against a frozen baseline, with replay-exact count
accumulation."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from caseguarddatapipeline_spark.streaming.drift import (
    PSI_ALERT,
    run_drift_stream,
    write_baseline,
)


def _write_batch(d: str, n: int, rows) -> None:
    with open(os.path.join(d, f"batch{n}.json"), "w") as f:
        for i, (etype, value) in enumerate(rows):
            f.write(
                json.dumps(
                    {
                        "event_id": n * 100_000 + i,
                        "ts": "2024-01-01T00:00:00",
                        "user_id": 1,
                        "event_type": etype,
                        "value": value,
                    }
                )
                + "\n"
            )


def test_drift_stream_alerts_on_shift(spark, tmp_path):
    inp = str(tmp_path / "in")
    base_dir = str(tmp_path / "baseline")
    counts, out, ck = (
        str(tmp_path / "counts"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    os.makedirs(inp)

    # baseline: 'click' values in bin 1 (60.0), 'view' in bin 0 (10.0)
    baseline_events = spark.createDataFrame(
        [("click", 60.0)] * 40 + [("view", 10.0)] * 40,
        "event_type string, value double",
    )
    write_baseline(baseline_events, base_dir)

    # batch 1 matches the baseline -> no drift anywhere
    _write_batch(inp, 1, [("click", 60.0)] * 20 + [("view", 10.0)] * 20)
    run_drift_stream(spark, inp, base_dir, counts, out, ck)
    r1 = {r["event_type"]: r for r in spark.read.parquet(out).collect()}
    assert set(r1) == {"click", "view"}
    assert not r1["click"]["drifted"] and not r1["view"]["drifted"]
    # identical distribution: PSI stays in the <0.1 "stable" band (it is
    # not exactly 0 — Laplace smoothing differs with 40 vs 20 samples)
    assert r1["click"]["psi"] < 0.1

    # batch 2: 'click' moves entirely to bin 4 (210.0) -> cumulative
    # profile shifts past the alert band; 'view' stays put
    _write_batch(inp, 2, [("click", 210.0)] * 60 + [("view", 10.0)] * 20)
    run_drift_stream(spark, inp, base_dir, counts, out, ck)
    latest = (
        spark.read.parquet(out)
        .filter(F.col("batch_id") == F.lit(1))
        .collect()
    )
    r2 = {r["event_type"]: r for r in latest}
    assert r2["click"]["drifted"] and r2["click"]["psi"] >= PSI_ALERT
    assert not r2["view"]["drifted"]
    # cumulative counts: batch partitions accumulate, never double-add
    assert r2["click"]["n_curr"] == 80 and r2["view"]["n_curr"] == 40

    # earlier batch's report is untouched by the later drain
    first = {
        r["event_type"]: r
        for r in spark.read.parquet(out)
        .filter(F.col("batch_id") == F.lit(0))
        .collect()
    }
    assert not first["click"]["drifted"]


def test_null_rows_divert(spark, tmp_path):
    inp = str(tmp_path / "in")
    base_dir = str(tmp_path / "baseline")
    os.makedirs(inp)
    write_baseline(
        spark.createDataFrame([("click", 60.0)] * 40, "event_type string, value double"),
        base_dir,
    )
    with open(os.path.join(inp, "b.json"), "w") as f:
        for i in range(20):
            f.write(json.dumps({"event_id": i, "ts": "2024-01-01T00:00:00",
                                "user_id": 1, "event_type": "click", "value": 60.0}) + "\n")
        f.write(json.dumps({"event_id": 98, "ts": "2024-01-01T00:00:00",
                            "user_id": 1, "event_type": None, "value": 1.0}) + "\n")
        f.write(json.dumps({"event_id": 99, "ts": "2024-01-01T00:00:00",
                            "user_id": 1, "event_type": "click", "value": None}) + "\n")
    run_drift_stream(
        spark, inp, base_dir,
        str(tmp_path / "counts"), str(tmp_path / "out"), str(tmp_path / "ck"),
    )
    rows = spark.read.parquet(str(tmp_path / "out")).collect()
    # the two null rows diverted: only the 20 valid clicks were counted
    assert len(rows) == 1 and rows[0]["n_curr"] == 20
    assert not rows[0]["drifted"]


def test_baseline_only_type_is_not_drifted(spark, tmp_path):
    """A type in the baseline that the stream has not yet produced must
    surface as a no-data row (n_curr=0, drifted=False), not a standing
    false alarm — absence of data is not drift."""
    inp = str(tmp_path / "in")
    base_dir = str(tmp_path / "baseline")
    os.makedirs(inp)
    write_baseline(
        spark.createDataFrame(
            [("purchase", 60.0)] * 40 + [("click", 10.0)] * 40,
            "event_type string, value double",
        ),
        base_dir,
    )
    _write_batch(inp, 1, [("click", 10.0)] * 20)  # no 'purchase' yet
    run_drift_stream(
        spark, inp, base_dir,
        str(tmp_path / "counts"), str(tmp_path / "out"), str(tmp_path / "ck"),
    )
    rows = {r["event_type"]: r for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert rows["purchase"]["n_curr"] == 0
    assert not rows["purchase"]["drifted"]
    assert rows["purchase"]["psi"] > PSI_ALERT  # the raw score IS high
    assert not rows["click"]["drifted"]


def test_empty_first_batch_does_not_wedge(spark, tmp_path):
    """An all-inadmissible first batch must not fail the stream (there is
    no histogram to read yet); a later valid batch starts the state."""
    inp = str(tmp_path / "in")
    base_dir = str(tmp_path / "baseline")
    counts, out, ck = (
        str(tmp_path / "counts"), str(tmp_path / "out"), str(tmp_path / "ck"),
    )
    os.makedirs(inp)
    write_baseline(
        spark.createDataFrame([("click", 10.0)] * 10, "event_type string, value double"),
        base_dir,
    )
    _write_batch(inp, 1, [(None, 1.0), ("click", None)])
    run_drift_stream(spark, inp, base_dir, counts, out, ck)
    assert not [d for d in os.listdir(counts) if d.startswith("ingest_batch=")]

    _write_batch(inp, 2, [("click", 10.0)] * 10)
    run_drift_stream(spark, inp, base_dir, counts, out, ck)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1 and rows[0]["n_curr"] == 10 and not rows[0]["drifted"]


def test_drift_counts_maintenance_keeps_cumulative(spark, tmp_path):
    """Each counts partition is the full cumulative profile, so TTL can
    drop old ones without losing counts; the floor of 2 protects replay."""
    from caseguarddatapipeline_spark.streaming.drift import (
        maintain_drift_counts,
    )

    inp = str(tmp_path / "in")
    base_dir = str(tmp_path / "baseline")
    counts, out, ck = (
        str(tmp_path / "counts"), str(tmp_path / "out"), str(tmp_path / "ck"),
    )
    os.makedirs(inp)
    write_baseline(
        spark.createDataFrame([("click", 10.0)] * 10, "event_type string, value double"),
        base_dir,
    )
    for b in range(1, 5):
        _write_batch(inp, b, [("click", 10.0)] * 5)
        run_drift_stream(spark, inp, base_dir, counts, out, ck)

    assert maintain_drift_counts(counts, keep_batches=2) == 2
    kept = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(counts)
        if d.startswith("ingest_batch=")
    )
    assert kept == [2, 3]
    # the next drain continues from the latest cumulative partition
    _write_batch(inp, 5, [("click", 10.0)] * 5)
    run_drift_stream(spark, inp, base_dir, counts, out, ck)
    latest = spark.read.parquet(out).orderBy(F.desc("batch_id")).first()
    assert latest["n_curr"] == 25  # 5 batches x 5 events, nothing lost


def test_checkpoint_loss_full_replay_is_idempotent(spark, tmp_path):
    """Losing the checkpoint and re-draining the same input must converge
    to the same counts and reports: every batch owns its partitions, so a
    full replay overwrites rather than double-adds."""
    import shutil

    inp = str(tmp_path / "in")
    base_dir = str(tmp_path / "baseline")
    counts, out, ck = (
        str(tmp_path / "counts"), str(tmp_path / "out"), str(tmp_path / "ck"),
    )
    os.makedirs(inp)
    write_baseline(
        spark.createDataFrame([("click", 10.0)] * 10, "event_type string, value double"),
        base_dir,
    )
    for b in range(1, 4):
        _write_batch(inp, b, [("click", 10.0)] * 5)
    run_drift_stream(spark, inp, base_dir, counts, out, ck)
    before_counts = sorted(map(tuple, spark.read.parquet(counts).collect()))
    before_out = sorted(map(tuple, spark.read.parquet(out).collect()))

    shutil.rmtree(ck)  # checkpoint lost: the stream replays from scratch
    run_drift_stream(spark, inp, base_dir, counts, out, ck)
    assert sorted(map(tuple, spark.read.parquet(counts).collect())) == before_counts
    assert sorted(map(tuple, spark.read.parquet(out).collect())) == before_out


def test_fresh_checkpoint_against_old_counts_fails_fast(spark, tmp_path):
    """A FRESH checkpoint restarts batch ids at 0; pointing it at a
    counts_dir that already holds higher-numbered partitions must raise
    (not silently restart accumulation from empty while maintenance keeps
    preferring the stale high-numbered partitions)."""
    import pytest

    inp = str(tmp_path / "in")
    base_dir = str(tmp_path / "baseline")
    counts, out, ck = (
        str(tmp_path / "counts"), str(tmp_path / "out"), str(tmp_path / "ck"),
    )
    os.makedirs(inp)
    write_baseline(
        spark.createDataFrame(
            [("click", 10.0)] * 10, "event_type string, value double"
        ),
        base_dir,
    )
    _write_batch(inp, 1, [("click", 10.0)] * 5)
    _write_batch(inp, 2, [("click", 10.0)] * 5)
    # one file per trigger -> batches 0 and 1 -> counts holds both
    run_drift_stream(spark, inp, base_dir, counts, out, ck, max_files_per_trigger=1)
    assert os.path.isdir(os.path.join(counts, "ingest_batch=1"))

    import shutil

    shutil.rmtree(ck)  # FRESH checkpoint, same counts_dir: ids restart at 0
    with pytest.raises(Exception, match="does not own this state"):
        run_drift_stream(
            spark, inp, base_dir, counts, out, ck, max_files_per_trigger=1
        )
    # the stale partitions were not touched by the refused run
    assert os.path.isdir(os.path.join(counts, "ingest_batch=1"))
