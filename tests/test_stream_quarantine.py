"""Streaming expectation gate: clean rows flow, violators quarantine with
the names of the rules they broke."""

from __future__ import annotations

import json

from caseguarddatapipeline_spark.streaming.quarantine import run_quarantine_stream


def _write(d, name, rows):
    d.mkdir(parents=True, exist_ok=True)
    with open(d / name, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def test_quarantine_routes_and_tags(spark, tmp_path):
    events = tmp_path / "events"
    out, quar = str(tmp_path / "out"), str(tmp_path / "quar")
    ckpt = str(tmp_path / "ckpt")
    _write(events, "b1.json", [
        {"event_id": 1, "ts": "2024-01-01 10:00:00", "event_type": "view",
         "value": 1.0},
        # negative value → one violation
        {"event_id": 2, "ts": "2024-01-01 10:01:00", "event_type": "click",
         "value": -5.0},
        # unknown type AND null ts → two violations
        {"event_id": 3, "ts": None, "event_type": "bogus", "value": 2.0},
        # null value counts as a violation (conservative contract)
        {"event_id": 4, "ts": "2024-01-01 10:02:00", "event_type": "view",
         "value": None},
    ])
    run_quarantine_stream(spark, str(events), out, quar, ckpt)

    clean = spark.read.parquet(out).collect()
    assert {r.event_id for r in clean} == {1}
    assert "violated" not in spark.read.parquet(out).columns

    bad = {r.event_id: set(r.violated) for r in spark.read.parquet(quar).collect()}
    assert bad[2] == {"value.non_negative"}
    assert bad[3] == {"ts.not_null", "event_type.in_domain"}
    assert bad[4] == {"value.non_negative"}

    # second batch appends incrementally through the same checkpoint
    _write(events, "b2.json", [
        {"event_id": 5, "ts": "2024-01-01 11:00:00", "event_type": "purchase",
         "value": 9.0},
    ])
    run_quarantine_stream(spark, str(events), out, quar, ckpt)
    assert {r.event_id for r in spark.read.parquet(out).collect()} == {1, 5}
