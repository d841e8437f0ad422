"""Retry + circuit-breaker wrapper for external-call stages (SURVEY.md §4:
the reference's error-handling layer, core/error_handling.py:165-260,
553-642, and exponential backoff at etl/prefect_config.py:192).

Spark's task retries cover crashed tasks, but a misbehaving external
endpoint (LLM/embedding/parser API) fails *calls*, not tasks — retrying
the whole task re-pays the batch. This wrapper lives INSIDE the
mapInPandas stage, around the per-batch model call:

- exponential backoff retries ([1,2,4,8]s shape, injectable sleep),
- a circuit breaker that opens after ``failure_threshold`` consecutive
  failures — subsequent calls fail fast (or fall back) for
  ``reset_after`` seconds instead of hammering a down endpoint from
  hundreds of executors simultaneously,
- an optional fallback producing the reference's "degraded insight"
  behavior (ai/enricher.py:47-86 returns a fallback insight on failure).

State is per-executor-process (a breaker per Python worker), which is the
right scope: breakers exist to protect the *endpoint*, and per-worker
open/close converges cluster-wide within one batch round.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import Any


class CircuitOpenError(RuntimeError):
    pass


class Resilient:
    """Wrap a callable with retries + a circuit breaker."""

    def __init__(
        self,
        fn: Callable[..., Any],
        max_attempts: int = 4,
        base_delay: float = 1.0,
        failure_threshold: int = 5,
        reset_after: float = 60.0,
        fallback: Callable[..., Any] | None = None,
        sleep: Callable[[float], None] = time.sleep,
        clock: Callable[[], float] = time.monotonic,
    ):
        self._fn = fn
        self._max_attempts = max_attempts
        self._base_delay = base_delay
        self._failure_threshold = failure_threshold
        self._reset_after = reset_after
        self._fallback = fallback
        self._sleep = sleep
        self._clock = clock
        self._consecutive_failures = 0
        self._opened_at: float | None = None
        # Invocations of fn consumed by the most recent __call__ — the
        # retry-exhaustion signal dead-letter triage keys on (T4). 0 when
        # the circuit fast-failed without touching fn.
        self.last_attempts = 0

    @property
    def is_open(self) -> bool:
        if self._opened_at is None:
            return False
        if self._clock() - self._opened_at >= self._reset_after:
            # half-open: allow the next call through to probe
            self._opened_at = None
            self._consecutive_failures = self._failure_threshold - 1
            return False
        return True

    def __call__(self, *args: Any, **kwargs: Any) -> Any:
        self.last_attempts = 0
        if self.is_open:
            if self._fallback is not None:
                return self._fallback(*args, **kwargs)
            raise CircuitOpenError("circuit open; failing fast")
        last_exc: Exception | None = None
        for attempt in range(self._max_attempts):
            self.last_attempts = attempt + 1
            try:
                result = self._fn(*args, **kwargs)
                self._consecutive_failures = 0
                return result
            except Exception as exc:  # noqa: BLE001 — endpoint errors are opaque
                last_exc = exc
                self._consecutive_failures += 1
                if self._consecutive_failures >= self._failure_threshold:
                    self._opened_at = self._clock()
                    break
                if attempt < self._max_attempts - 1:
                    self._sleep(self._base_delay * (2**attempt))
        if self._fallback is not None:
            return self._fallback(*args, **kwargs)
        raise last_exc  # type: ignore[misc]
