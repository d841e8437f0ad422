"""Data-dominated throughput floors: the committed STRESS.json record
(tools/stress_scale.py, 10× sf0.1 ≈ 6 M fact rows on local[32]) must stay
above the pinned Mrows/s floors. The sf0.1 bench measures per-query fixed
cost; THIS artifact is the measured form of the 100 TB design claim — if a
plan change regresses scan/join/window throughput at 10×, the recorded
numbers drop below the floor and this pin fails on regeneration.
"""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load():
    path = REPO / "STRESS.json"
    assert path.exists(), (
        "STRESS.json missing — regenerate with `python tools/stress_scale.py 10`"
    )
    return json.loads(path.read_text())


def test_stress_record_shape():
    doc = _load()
    assert doc["metric"] == "stress_scale"
    assert doc["replicas"] >= 10, "committed record must be the 10x run"
    assert doc["fact_rows"] >= 5_000_000
    assert set(doc["shapes"]) == {
        "agg_scan", "join_agg", "window_topk", "lsh_neardup", "span_dedup",
        "prefix_filter", "containment", "ivf_search", "winnow_join",
        "raster_decode", "audio_decode", "doc_decode", "binary_search",
    }


def test_stress_throughput_floors():
    import sys

    sys.path.insert(0, str(REPO))
    from tools.stress_scale import FLOORS

    doc = _load()
    # the committed record must have been produced against the same floors
    assert doc["floors_mrows_per_sec"] == FLOORS
    for shape, floor in FLOORS.items():
        got = doc["shapes"][shape]["mrows_per_sec"]
        assert got >= floor, (
            f"{shape}: {got} Mrows/s below the {floor} floor — a plan "
            "regression at data-dominated scale (check for a lost map-side "
            "combine, an extra shuffle, or a collapsed sort)"
        )


def test_assembly_record_floor():
    """The composed corpus-assembly record (tools/assembly_bench.py, 50×
    boilerplate-replica corpus on local[32]) must exist, chain every
    stage, and hold its end-to-end throughput floor — the proof the
    dedup/quality/mixture/budget/pack families compose without a
    driver-side seam, not just pass in isolation."""
    import sys

    sys.path.insert(0, str(REPO))
    from tools.assembly_bench import FLOORS as ASM_FLOORS

    path = REPO / "ASSEMBLY.json"
    assert path.exists(), (
        "ASSEMBLY.json missing — regenerate with "
        "`python tools/assembly_bench.py 50`"
    )
    doc = json.loads(path.read_text())
    assert doc["metric"] == "corpus_assembly"
    assert doc["replicas"] >= 50
    assert doc["n_docs_in"] >= 200_000
    assert list(doc["stages"]) == [
        "exact_dedup",
        "lsh_neardup",
        "gopher_battery",
        "weighted_mixture",
        "token_budget",
        "sequence_pack",
        "sharded_write",
    ]
    # every stage produced rows and the funnel is monotone where it
    # should be (dedup and admission only remove)
    assert all(s["rows_out"] > 0 for s in doc["stages"].values())
    assert (
        doc["stages"]["lsh_neardup"]["rows_out"]
        <= doc["stages"]["exact_dedup"]["rows_out"]
    )
    assert doc["floors"] == ASM_FLOORS
    assert doc["docs_per_sec"] >= ASM_FLOORS["docs_per_sec"], (
        f"composed assembly throughput {doc['docs_per_sec']} docs/s below "
        f"the {ASM_FLOORS['docs_per_sec']} floor — a stage regressed "
        "(see the per-stage breakdown in ASSEMBLY.json)"
    )
