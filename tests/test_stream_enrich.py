"""Stream-static enrichment: dimension overwrites are visible to the next
micro-batch without restarting the query."""

from __future__ import annotations

import json

from caseguarddatapipeline_spark.streaming.enrich import run_enrich_stream


def _write_events(d, name, rows):
    d.mkdir(parents=True, exist_ok=True)
    with open(d / name, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _write_dim(spark, path, rows):
    spark.createDataFrame(
        rows, "event_type string, category string, weight double"
    ).write.mode("overwrite").parquet(path)


def test_dim_refresh_picked_up_next_batch(spark, tmp_path):
    events = tmp_path / "events"
    dim, out = str(tmp_path / "dim"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_dim(spark, dim, [("view", "browse", 1.0), ("click", "engage", 2.0)])
    _write_events(events, "b1.json", [
        {"event_id": 1, "ts": "2024-01-01 10:00:00", "event_type": "view",
         "value": 1.0},
        {"event_id": 2, "ts": "2024-01-01 10:01:00", "event_type": "purchase",
         "value": 5.0},  # no dim row yet → NULL enrichment, row kept
    ])
    run_enrich_stream(spark, str(events), dim, out, ckpt)
    got = {r.event_id: r for r in spark.read.parquet(out).collect()}
    assert got[1].category == "browse" and got[1].weight == 1.0
    assert got[2].category is None  # unmatched kept, not dropped

    # out-of-band dimension update: purchase gains a row, view reweights
    _write_dim(spark, dim, [
        ("view", "browse", 9.0),
        ("purchase", "convert", 3.0),
    ])
    _write_events(events, "b2.json", [
        {"event_id": 3, "ts": "2024-01-01 11:00:00", "event_type": "view",
         "value": 1.0},
        {"event_id": 4, "ts": "2024-01-01 11:01:00", "event_type": "purchase",
         "value": 7.0},
    ])
    run_enrich_stream(spark, str(events), dim, out, ckpt)
    got = {r.event_id: r for r in spark.read.parquet(out).collect()}
    # batch-1 rows unchanged; batch-2 rows see the refreshed dimension
    assert got[1].weight == 1.0
    assert got[3].weight == 9.0
    assert got[4].category == "convert"
