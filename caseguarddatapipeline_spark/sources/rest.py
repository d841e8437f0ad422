"""REST case-fetch source (S3, SURVEY.md §2.1): a mapInPandas fetch stage
over a case-reference DataFrame.

The reference fetches each case from the Proclaim REST API — 4 calls per
case (caseguard/proclaim/client.py:180-221) with 401 re-auth + retry
(client.py:160-174). The Spark-first shape inverts control: the case-ref
frame is the driver of work, each partition's python worker holds ONE
authenticated client (built lazily from an injectable factory — the same
seam as the JDBC sink's connection factory), and every call runs through
the ``Resilient`` retry/backoff/circuit-breaker wrapper so a down
endpoint degrades to fallback rows instead of failing tasks and
re-paying whole batches.

At scale the fetch stage is bandwidth-bound, not CPU-bound: parallelism
= partitions of the ref frame (``repartition(n)`` upstream to match the
API's concurrency budget), and per-call pacing composes via the
``rate_sleep`` hook (T5's client-side limiter, matching the reference's
inter-call sleeps)."""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame

FETCH_SCHEMA = (
    "case_ref string, payload string, fetch_status string, attempts int"
)


def rest_fetch(
    refs: DataFrame,
    fetch_factory: Callable[[], Callable[[str], str]],
    *,
    ref_col: str = "case_ref",
    max_attempts: int = 4,
    base_delay: float = 1.0,
    failure_threshold: int = 5,
    sleep: Callable[[float], None] | None = None,
) -> DataFrame:
    """Fetch one payload per reference row.

    ``fetch_factory`` is a picklable zero-arg callable returning the
    actual ``fetch(case_ref) -> payload-string`` client — in production a
    closure over an authenticated ``requests.Session`` (built once per
    python worker, like client.py's token cache; a 401 handler inside the
    client is the re-auth hook), in tests a deterministic stub. Failures
    after retries produce a row with ``fetch_status='failed'`` and a NULL
    payload rather than a task failure — the dead-letter pattern (T4), so
    one poisoned case cannot sink a 10M-case sync."""
    from ..operators.resilience import Resilient

    def stage(batches: Iterator) -> Iterator:
        import pandas as pd

        fetch = fetch_factory()  # one client per python worker
        kwargs = {"sleep": sleep} if sleep is not None else {}
        wrapped = Resilient(
            fetch,
            max_attempts=max_attempts,
            base_delay=base_delay,
            failure_threshold=failure_threshold,
            **kwargs,
        )
        for pdf in batches:
            out = {"case_ref": [], "payload": [], "fetch_status": [], "attempts": []}
            for ref in pdf[ref_col]:
                try:
                    payload = wrapped(ref)
                    status = "ok"
                except Exception:  # noqa: BLE001 — endpoint errors are opaque
                    payload, status = None, "failed"
                out["case_ref"].append(ref)
                out["payload"].append(payload)
                out["fetch_status"].append(status)
                # real retry count from the wrapper — DLQ triage (T4)
                # distinguishes retry-exhausted rows from first-try
                # failures by this column
                out["attempts"].append(wrapped.last_attempts)
            yield pd.DataFrame(out)

    return refs.select(ref_col).mapInPandas(stage, FETCH_SCHEMA)
