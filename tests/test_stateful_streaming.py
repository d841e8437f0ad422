"""Stateful watermark tracking (applyInPandasWithState): per-entity state
advances within a run and persists across runs via the checkpoint."""

from __future__ import annotations

import json

from caseguarddatapipeline_spark.streaming.stateful import run_watermark_stream


def _write_batch(queue_dir, name, rows):
    queue_dir.mkdir(parents=True, exist_ok=True)
    with open(queue_dir / name, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def test_watermark_state_across_runs(spark, tmp_path):
    events = tmp_path / "events"
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ckpt")

    _write_batch(
        events,
        "b1.json",
        [
            {"entity_id": 1, "serialno": 10},
            {"entity_id": 1, "serialno": 12},
            {"entity_id": 2, "serialno": 5},
        ],
    )
    run_watermark_stream(spark, str(events), str(out), ckpt)
    first = {
        r["entity_id"]: r
        for r in spark.read.parquet(str(out)).collect()
    }
    assert first[1]["watermark"] == 12 and first[1]["n_events"] == 2
    assert first[1]["advanced_by"] == 12  # from initial 0
    assert first[2]["watermark"] == 5

    # second batch: entity 1 advances, entity 2 regresses (stale serial —
    # watermark must NOT move backwards), entity 3 is new
    _write_batch(
        events,
        "b2.json",
        [
            {"entity_id": 1, "serialno": 15},
            {"entity_id": 2, "serialno": 3},
            {"entity_id": 3, "serialno": 7},
        ],
    )
    run_watermark_stream(spark, str(events), str(out), ckpt)
    rows = spark.read.parquet(str(out)).collect()
    # latest state per entity = row with max n_events
    latest = {}
    for r in rows:
        if r["entity_id"] not in latest or r["n_events"] > latest[r["entity_id"]]["n_events"]:
            latest[r["entity_id"]] = r
    assert latest[1]["watermark"] == 15 and latest[1]["n_events"] == 3
    assert latest[1]["advanced_by"] == 3  # 12 -> 15: state survived the restart
    assert latest[2]["watermark"] == 5 and latest[2]["advanced_by"] == 0
    assert latest[3]["watermark"] == 7 and latest[3]["n_events"] == 1


def test_watermark_state_across_runs_tws(spark, tmp_path):
    # same semantics as above, on the transformWithStateInPandas API
    # (state v2 + RocksDB store): state must survive a query restart and
    # never move backwards on stale serials.
    import pytest

    from caseguarddatapipeline_spark.streaming.stateful import (
        HAS_TWS,
        run_watermark_stream_tws,
    )

    if not HAS_TWS:
        pytest.skip("transformWithStateInPandas not available")

    events = tmp_path / "events"
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ckpt")

    _write_batch(
        events,
        "b1.json",
        [
            {"entity_id": 1, "serialno": 10},
            {"entity_id": 1, "serialno": 12},
            {"entity_id": 2, "serialno": 5},
        ],
    )
    run_watermark_stream_tws(spark, str(events), str(out), ckpt)
    first = {r["entity_id"]: r for r in spark.read.parquet(str(out)).collect()}
    assert first[1]["watermark"] == 12 and first[1]["n_events"] == 2
    assert first[2]["watermark"] == 5

    _write_batch(
        events,
        "b2.json",
        [
            {"entity_id": 1, "serialno": 15},
            {"entity_id": 2, "serialno": 3},
            {"entity_id": 3, "serialno": 7},
        ],
    )
    run_watermark_stream_tws(spark, str(events), str(out), ckpt)
    latest = {}
    for r in spark.read.parquet(str(out)).collect():
        if r["entity_id"] not in latest or r["n_events"] > latest[r["entity_id"]]["n_events"]:
            latest[r["entity_id"]] = r
    assert latest[1]["watermark"] == 15 and latest[1]["advanced_by"] == 3
    assert latest[2]["watermark"] == 5 and latest[2]["advanced_by"] == 0
    assert latest[3]["watermark"] == 7 and latest[3]["n_events"] == 1
