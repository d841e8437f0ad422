"""Observed metrics: admission telemetry from the same pass as the output."""

from __future__ import annotations

from caseguarddatapipeline_spark.operators.observability import (
    MAX_CHARS,
    MIN_CHARS,
    admit_documents_observed,
)
from caseguarddatapipeline_spark.sources import load_table


def test_admission_metrics_from_single_pass(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    admitted, obs = admit_documents_observed(docs)
    rows = admitted.collect()  # the action that populates the observation

    m = obs.get
    assert m["n_total"] == docs.count()
    assert m["n_admitted"] == len(rows)
    assert m["n_admitted"] + m["n_rejected"] == m["n_total"]
    assert m["n_rejected"] > 0  # the bounds actually reject something
    assert m["admitted_chars"] == sum(r.n_chars for r in rows)
    assert all(MIN_CHARS <= r.n_chars <= MAX_CHARS for r in rows)
