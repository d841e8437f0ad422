"""Stream-stream interval join: in-window completions match, out-of-window
ones don't, and the left-outer variant emits timeout rows only after the
watermark proves no completion can still arrive."""

from __future__ import annotations

import json

from caseguarddatapipeline_spark.streaming.joins import run_match_stream


def _write(d, name, rows):
    d.mkdir(parents=True, exist_ok=True)
    with open(d / name, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _read(spark, out):
    return {r["job_id"]: r.asDict() for r in spark.read.parquet(str(out)).collect()}


def test_inner_interval_match(spark, tmp_path):
    jobs, dones = tmp_path / "jobs", tmp_path / "dones"
    out, ckpt = tmp_path / "out", str(tmp_path / "ckpt")
    _write(jobs, "b1.json", [
        {"job_id": 1, "enqueue_ts": "2024-01-01 10:00:00", "priority": 1},
        {"job_id": 2, "enqueue_ts": "2024-01-01 10:05:00", "priority": 2},
        {"job_id": 3, "enqueue_ts": "2024-01-01 10:10:00", "priority": 1},
    ])
    _write(dones, "b1.json", [
        # in-window (10 min after enqueue)
        {"job_id": 1, "done_ts": "2024-01-01 10:10:00", "status": "ok"},
        # OUT of window: 45 min after enqueue, interval is 30 min
        {"job_id": 2, "done_ts": "2024-01-01 10:50:00", "status": "ok"},
    ])
    run_match_stream(spark, str(jobs), str(dones), str(out), ckpt)
    got = _read(spark, out)
    assert set(got) == {1}
    assert got[1]["status"] == "ok" and got[1]["latency_sec"] == 600.0

    # late-arriving (next batch) but in-window completion still matches:
    # buffered job state outlives the micro-batch
    _write(dones, "b2.json", [
        {"job_id": 3, "done_ts": "2024-01-01 10:25:00", "status": "ok"},
    ])
    run_match_stream(spark, str(jobs), str(dones), str(out), ckpt)
    got = _read(spark, out)
    assert set(got) == {1, 3}
    assert got[3]["latency_sec"] == 900.0


def test_left_outer_emits_timeouts_after_watermark(spark, tmp_path):
    jobs, dones = tmp_path / "jobs", tmp_path / "dones"
    out, ckpt = tmp_path / "out", str(tmp_path / "ckpt")
    _write(jobs, "b1.json", [
        {"job_id": 1, "enqueue_ts": "2024-01-01 10:00:00", "priority": 1},
        {"job_id": 2, "enqueue_ts": "2024-01-01 10:05:00", "priority": 2},
    ])
    _write(dones, "b1.json", [
        {"job_id": 1, "done_ts": "2024-01-01 10:10:00", "status": "ok"},
    ])
    run_match_stream(spark, str(jobs), str(dones), str(out), ckpt,
                     how="leftOuter")
    got = _read(spark, out)
    # job 2 is unmatched but NOT yet a timeout: the watermark hasn't
    # passed 10:05 + 30min + 1h, so the row is withheld (a completion
    # could still arrive)
    assert set(got) == {1}

    # advance both watermarks far past the horizon: job 2 now provably
    # timed out → emits with NULL completion columns
    _write(jobs, "b2.json", [
        {"job_id": 9, "enqueue_ts": "2024-01-01 15:00:00", "priority": 3},
    ])
    _write(dones, "b2.json", [
        {"job_id": 9, "done_ts": "2024-01-01 15:01:00", "status": "ok"},
    ])
    run_match_stream(spark, str(jobs), str(dones), str(out), ckpt,
                     how="leftOuter")
    got = _read(spark, out)
    assert 2 in got
    assert got[2]["status"] is None and got[2]["latency_sec"] is None
    assert got[9]["status"] == "ok"


def test_join_state_evicted_past_watermark(spark, tmp_path):
    """The interval bound makes buffered state EVICTABLE: once the
    watermark moves far past old jobs, the state store drops them —
    buffered rows track the interval horizon, not total stream length."""
    jobs, dones = tmp_path / "jobs", tmp_path / "dones"
    out, ckpt = tmp_path / "out", str(tmp_path / "ckpt")
    _write(jobs, "b1.json", [
        {"job_id": i, "enqueue_ts": f"2024-01-01 10:{i:02d}:00", "priority": 1}
        for i in range(20)
    ])
    _write(dones, "b1.json", [
        {"job_id": 0, "done_ts": "2024-01-01 10:05:00", "status": "ok"},
    ])
    q1 = run_match_stream(spark, str(jobs), str(dones), str(out), ckpt)
    s1 = q1.lastProgress["stateOperators"][0]
    assert s1["numRowsTotal"] > 0  # the 20 jobs are buffered, awaiting matches

    # jump event time a day ahead on BOTH streams: the watermark passes
    # every batch-1 row's horizon, so their state must be dropped
    _write(jobs, "b2.json", [
        {"job_id": 900, "enqueue_ts": "2024-01-02 12:00:00", "priority": 1},
    ])
    _write(dones, "b2.json", [
        {"job_id": 900, "done_ts": "2024-01-02 12:01:00", "status": "ok"},
    ])
    q2 = run_match_stream(spark, str(jobs), str(dones), str(out), ckpt)
    s2 = q2.lastProgress["stateOperators"][0]
    assert s2["numRowsRemoved"] > 0  # batch-1 state evicted
    assert s2["numRowsTotal"] <= 2  # only the fresh rows remain buffered
