"""Profiling operators: PSI drift against a hand-computed reference on a
corpus with a planted distribution shift."""

from __future__ import annotations

import datetime
import math

from caseguarddatapipeline_spark.operators.profiling import PSI_BINS, a32_psi_drift


def test_psi_drift_matches_closed_form(spark, tmp_path):
    """A type whose value distribution shifts between halves must show a
    large PSI; a stationary type must show PSI ~ 0 — both equal to the
    Laplace-smoothed closed form, with the time cutoff at the integer
    midpoint of the range."""
    t0 = datetime.datetime(2024, 1, 1)

    def ts(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    rows = []
    eid = 0
    # 'shift': values in bin 0 (value 10) early, bin 3 (value 160) late
    for m in range(20):
        rows.append((eid, ts(m), 1, "shift", 10.0)); eid += 1
    for m in range(100, 120):
        rows.append((eid, ts(m), 1, "shift", 160.0)); eid += 1
    # 'steady': same bin mix in both halves
    for m in list(range(20)) + list(range(100, 120)):
        rows.append((eid, ts(m), 2, "steady", 60.0)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    def psi(base_bins, curr_bins):
        nb, nc = sum(base_bins), sum(curr_bins)
        out = 0.0
        for b in range(PSI_BINS):
            p = (base_bins[b] + 1.0) / (nb + float(PSI_BINS))
            q = (curr_bins[b] + 1.0) / (nc + float(PSI_BINS))
            out += (p - q) * math.log(p / q)
        return out

    # cutoff = midpoint of [0, 119] minutes -> minute 59.5: 'base' is
    # minutes 0-19, 'curr' is minutes 100-119 for both types
    shift_expected = psi(
        [20, 0, 0, 0, 0, 0], [0, 0, 0, 20, 0, 0]
    )
    steady_expected = psi(
        [0, 20, 0, 0, 0, 0], [0, 20, 0, 0, 0, 0]
    )

    got = {r["event_type"]: r for r in a32_psi_drift(spark, str(tmp_path)).collect()}
    assert got["shift"]["n_base"] == got["shift"]["n_curr"] == 20
    assert abs(got["shift"]["psi"] - shift_expected) < 1e-6
    assert abs(got["steady"]["psi"] - steady_expected) < 1e-6
    assert got["steady"]["psi"] == 0.0
    assert got["shift"]["psi"] > 0.25  # the 'drifted' alert band
