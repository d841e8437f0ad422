"""Retry/backoff + circuit breaker semantics (deterministic clocks)."""

from __future__ import annotations

import pytest

from caseguarddatapipeline_spark.operators.resilience import (
    CircuitOpenError,
    Resilient,
)


class Flaky:
    def __init__(self, fail_times):
        self.fail_times = fail_times
        self.calls = 0

    def __call__(self, x):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise RuntimeError("boom")
        return x * 2


def test_retries_with_exponential_backoff():
    sleeps = []
    fn = Flaky(fail_times=2)
    r = Resilient(fn, max_attempts=4, base_delay=1.0, sleep=sleeps.append)
    assert r(21) == 42
    assert fn.calls == 3
    assert sleeps == [1.0, 2.0]  # 1s then 2s before the success


def test_exhausted_retries_raise():
    r = Resilient(Flaky(fail_times=10), max_attempts=3, sleep=lambda s: None,
                  failure_threshold=99)
    with pytest.raises(RuntimeError, match="boom"):
        r(1)


def test_breaker_opens_and_fails_fast():
    fn = Flaky(fail_times=100)
    now = [0.0]
    r = Resilient(fn, max_attempts=10, failure_threshold=5, reset_after=60,
                  sleep=lambda s: None, clock=lambda: now[0])
    with pytest.raises(RuntimeError):
        r(1)
    assert fn.calls == 5  # stopped at the threshold, not max_attempts
    with pytest.raises(CircuitOpenError):
        r(1)
    assert fn.calls == 5  # fail-fast: no endpoint call while open


def test_breaker_half_open_probe_recovers():
    fn = Flaky(fail_times=5)
    now = [0.0]
    r = Resilient(fn, max_attempts=10, failure_threshold=5, reset_after=60,
                  sleep=lambda s: None, clock=lambda: now[0])
    with pytest.raises(RuntimeError):
        r(1)
    now[0] = 61.0  # past reset window → half-open, one probe allowed
    assert r(21) == 42
    assert not r.is_open


def test_fallback_on_open_circuit():
    fn = Flaky(fail_times=100)
    r = Resilient(fn, max_attempts=10, failure_threshold=3, reset_after=60,
                  sleep=lambda s: None, clock=lambda: 0.0,
                  fallback=lambda x: -1)
    assert r(1) == -1  # breaker tripped mid-call → fallback
    assert r(1) == -1  # open → fallback without endpoint calls
    assert fn.calls == 3


def test_resilient_inside_mapinpandas(spark):
    """The wrapper composes with an Arrow-batched stage: a flaky 'model'
    falls back per batch, and every row still comes out."""
    import pandas as pd

    def batches_fn(pdfs):
        def model(texts):
            raise RuntimeError("endpoint down")

        resilient = Resilient(
            model, max_attempts=2, failure_threshold=2, sleep=lambda s: None,
            fallback=lambda texts: ["<fallback>"] * len(texts),
        )
        for pdf in pdfs:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "summary": resilient(pdf["text"])}
            )

    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(20)], ["doc_id", "text"]
    ).repartition(4)
    out = df.mapInPandas(batches_fn, schema="doc_id long, summary string").collect()
    assert len(out) == 20
    assert all(r["summary"] == "<fallback>" for r in out)
