"""Streaming throughput floors: the committed STREAM.json record
(tools/stream_bench.py) must stay above the pinned rows/s floors — the
T-family's measured perf baseline, the streaming analogue of the batch
STRESS.json pin."""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load():
    path = REPO / "STREAM.json"
    assert path.exists(), (
        "STREAM.json missing — regenerate with `python tools/stream_bench.py`"
    )
    return json.loads(path.read_text())


def test_stream_record_shape():
    doc = _load()
    assert doc["metric"] == "stream_throughput"
    assert set(doc["pipelines"]) == {
        "windowed_agg",
        "jobs_parse_dedup",
        "neardup_drain",
        "span_drain",
        "winnow_drain",
        "vecingest_drain",
    }
    # the ingest drain must have applied one version per micro-batch
    assert doc["pipelines"]["vecingest_drain"]["versions"] >= doc[
        "pipelines"
    ]["vecingest_drain"]["batches"]
    # the stateful pipelines must actually have exercised the state store
    assert doc["pipelines"]["windowed_agg"].get("state_rows", 0) > 0
    # the dedup drains must have found the planted duplicates
    assert doc["pipelines"]["neardup_drain"]["pairs_found"] > 0
    assert doc["pipelines"]["span_drain"]["docs_flagged"] > 0
    assert doc["pipelines"]["winnow_drain"]["docs_flagged"] > 0


def test_stream_throughput_floors():
    import sys

    sys.path.insert(0, str(REPO))
    from tools.stream_bench import FLOORS

    doc = _load()
    assert doc["floors_rows_per_sec"] == FLOORS
    for name, floor in FLOORS.items():
        p = doc["pipelines"][name]
        got = p.get("median_rows_per_sec") or p.get("rows_per_sec") or 0
        assert got >= floor, (
            f"{name}: {got} rows/s below the {floor} floor — check for a "
            "per-row Python hot path or a state-store regression"
        )
