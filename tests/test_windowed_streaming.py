"""Event-time windows + watermark: windows finalize once the watermark
passes, and too-late events are dropped instead of mutating emitted rows."""

from __future__ import annotations

import json

from caseguarddatapipeline_spark.streaming.windows import run_windowed_stream


def _write(events_dir, name, rows):
    events_dir.mkdir(parents=True, exist_ok=True)
    with open(events_dir / name, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _read(spark, out):
    return {
        (r["window_start"], r["event_type"]): r
        for r in spark.read.parquet(str(out)).collect()
    }


def test_windows_finalize_and_drop_late(spark, tmp_path):
    events = tmp_path / "events"
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ckpt")

    # batch 1: two events at 10:xx, one at 12:05 (advances watermark to
    # 11:05 with 1h delay → the 10:00 window finalizes and emits)
    _write(
        events,
        "b1.json",
        [
            {"event_id": 1, "ts": "2024-01-01 10:10:00", "event_type": "view", "value": 1.0},
            {"event_id": 2, "ts": "2024-01-01 10:40:00", "event_type": "view", "value": 2.0},
            {"event_id": 3, "ts": "2024-01-01 12:05:00", "event_type": "view", "value": 4.0},
        ],
    )
    run_windowed_stream(spark, str(events), str(out), ckpt)
    got = _read(spark, out)
    k10 = ("2024-01-01 10:00", "view")
    assert got[k10]["n_events"] == 2 and got[k10]["total_value"] == 3.0
    # the 12:00 window is still open (watermark 11:05) — not emitted yet
    assert ("2024-01-01 12:00", "view") not in got

    # batch 2: a too-late 10:20 event (watermark already at 11:05) must be
    # dropped; a 14:10 event pushes the watermark past 12:00+1h so the
    # 12:00 window now emits — WITHOUT the late event's interference
    _write(
        events,
        "b2.json",
        [
            {"event_id": 4, "ts": "2024-01-01 10:20:00", "event_type": "view", "value": 100.0},
            {"event_id": 5, "ts": "2024-01-01 14:10:00", "event_type": "view", "value": 8.0},
        ],
    )
    run_windowed_stream(spark, str(events), str(out), ckpt)
    got = _read(spark, out)
    # 10:00 window unchanged (late event dropped, no duplicate emission)
    assert got[k10]["n_events"] == 2 and got[k10]["total_value"] == 3.0
    k12 = ("2024-01-01 12:00", "view")
    assert got[k12]["n_events"] == 1 and got[k12]["total_value"] == 4.0


def test_session_windows_merge_and_close(spark, tmp_path):
    from caseguarddatapipeline_spark.streaming.windows import run_session_stream

    events = tmp_path / "sess_events"
    out = tmp_path / "sess_out"
    ckpt = str(tmp_path / "sess_ckpt")

    # three events 10 min apart -> ONE session; then a gap > 30 min -> a
    # second session; a far-future event closes both
    _write(
        events,
        "b1.json",
        [
            {"event_id": 1, "ts": "2024-01-01 10:00:00", "event_type": "view", "value": 1.0},
            {"event_id": 2, "ts": "2024-01-01 10:10:00", "event_type": "view", "value": 2.0},
            {"event_id": 3, "ts": "2024-01-01 10:20:00", "event_type": "view", "value": 4.0},
            {"event_id": 4, "ts": "2024-01-01 11:30:00", "event_type": "view", "value": 8.0},
            {"event_id": 5, "ts": "2024-01-02 09:00:00", "event_type": "view", "value": 0.0},
        ],
    )
    run_session_stream(spark, str(events), str(out), ckpt)
    rows = sorted(
        spark.read.parquet(str(out)).collect(), key=lambda r: r["session_start"]
    )
    closed = [r for r in rows if r["session_start"].startswith("2024-01-01")]
    assert len(closed) == 2
    first, second = closed
    assert first["n_events"] == 3 and first["session_value"] == 7.0
    # session end = last event + gap
    assert first["session_end"] == "2024-01-01 10:50:00"
    assert second["n_events"] == 1 and second["session_value"] == 8.0
