"""Streaming dedup: redelivered event_ids inside the watermark horizon
are counted once; windows finalize with deduped counts."""

from __future__ import annotations

import json

from caseguarddatapipeline_spark.streaming.dedup import run_dedup_stream


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


def test_redelivered_events_counted_once(spark, tmp_path):
    events = tmp_path / "dd_events"
    out = tmp_path / "dd_out"
    ckpt = str(tmp_path / "dd_ckpt")

    # batch 1: event 1 delivered THREE times (worker retries), event 2
    # once; the 12:05 event advances the watermark past 10:00+1h so the
    # 10:00 window finalizes.
    _write(
        events,
        "b1.json",
        [
            {"event_id": 1, "ts": "2024-01-01 10:10:00", "event_type": "view", "value": 1.0},
            {"event_id": 1, "ts": "2024-01-01 10:10:00", "event_type": "view", "value": 1.0},
            {"event_id": 1, "ts": "2024-01-01 10:10:00", "event_type": "view", "value": 1.0},
            {"event_id": 2, "ts": "2024-01-01 10:40:00", "event_type": "view", "value": 2.0},
            {"event_id": 3, "ts": "2024-01-01 12:05:00", "event_type": "view", "value": 4.0},
        ],
    )
    run_dedup_stream(spark, str(events), str(out), ckpt)
    got = _read(spark, out)
    k10 = ("2024-01-01 10:00", "view")
    # three deliveries of event 1 → counted once
    assert got[k10]["n_events"] == 2 and got[k10]["total_value"] == 3.0

    # batch 2: event 3 redelivered (still within the watermark horizon →
    # dropped by dedup state), plus a 14:10 event that finalizes the
    # 12:00 window. Its count must be 1, not 2.
    _write(
        events,
        "b2.json",
        [
            {"event_id": 3, "ts": "2024-01-01 12:05:00", "event_type": "view", "value": 4.0},
            {"event_id": 9, "ts": "2024-01-01 14:10:00", "event_type": "view", "value": 8.0},
        ],
    )
    run_dedup_stream(spark, str(events), str(out), ckpt)
    got = _read(spark, out)
    assert got[k10]["n_events"] == 2  # unchanged
    k12 = ("2024-01-01 12:00", "view")
    assert got[k12]["n_events"] == 1 and got[k12]["total_value"] == 4.0
