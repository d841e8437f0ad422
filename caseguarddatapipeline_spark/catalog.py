"""Assembles the engine's query catalog: name → (spark fn, oracle SQL).

The driver contract (``__spark_entry__.py``) exposes exactly this catalog.
Modules register their QUERIES/ORACLES dicts here; a query without an oracle
gets the driver's weaker rows-only check (reserved for genuinely
non-SQL-expressible operators — hash-based near-dup candidates, pandas-UDF
inference stubs, stateful streaming).

Ordering contract: the driver's CORRECTNESS record covers the first 50
catalog entries in registration order — the "window". Round 12 replaced
the hand-maintained priority list with a MECHANICAL rotation (verdict
item 5): the window is ``_PINNED`` (the flagship + every entry NEW this
round, so the zero-debt policy stays structural) followed by the
STALEST oracle-backed queries — ascending (latest driver hash-green
round, name), from the generated ``_window_state.LAST_GREEN``
(tools/rotation.py scans CORRECTNESS_r*.json). Re-entry bound =
ceil(N_oracle_backed / (50 − |pins|)) rounds, mechanically: a typical
round pins 3-5 additions (≈45 rotation slots → every query re-proven
within ~6 rounds); round 12's unusually wide surface pins 15, still
bounding re-entry at ~7. No cohort can go stale the way the
round-1-5 cohorts did under the manual list (rounds 1-11's swap
history is in git: this file @ d49cd42).
Rows-only entries can never turn a slot green, so they are permanently
outside the window; each carries its exact evidence elsewhere
(a16_approx_distinct_users: pytest-pinned ±rel-sd vs exact distinct by
documented policy; e2_ivf_search: superseded by its exact-oracle
_1round/_2round twins + the recall assertion in tests/test_similarity.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ._window_state import LAST_GREEN
from .operators import relational
from .operators.reconcile import RECONCILIATION_SUMMARY_SQL, reconciliation_summary

QueryFn = Callable[[SparkSession, str], DataFrame]

_WINDOW_SLOTS = 50

# The flagship plus every catalog entry ADDED this round (zero-debt
# policy: new queries are driver-verified the round they ship); the
# remaining ~48 slots fill stalest-first from LAST_GREEN.
_PINNED = [
    "a1_reconciliation_summary",  # flagship continuity pin (r1-)
    # round-14 optimization restructures (zero-debt extends to CHANGED
    # internals, not just new entries): the beam search's fused
    # single-state-frame hops + the kNN kernel's dot/(na·nb) operand
    # order, the 128-bit two-seed span key, the BPE shared words
    # exchange, the bounded e5 caps collect, localCheckpoint label
    # propagation (and its two curation dependents), the gated simhash
    # fan-out hint, and the position-tagged fuzzy blocking.
    "e2_graph_search",
    "e2_graph_recall",
    "e1_span_dedup_sql",
    "e3_bpe_encode_sql",
    "e5_global_token_budget_sql",
    "e1_dedup_clusters",
    "e5_soft_dedup_sample",
    "e5_leakage_safe_split",
    "e1_simhash",
    "e1_fuzzy_name_match",
    # round-13 advice (medium): e3_trigram_familiarity's two-level
    # aggregation restructure shipped in r13 without a driver hash-green
    # (it was neither pinned nor rotation-due) — pin it now so the
    # changed aggregation is oracle-verified per the stated policy.
    "e3_trigram_familiarity",
]


def _window(names: list[str], oracles: dict[str, str]) -> list[str]:
    """The driver's 50-slot correctness window: pinned entries first,
    then every oracle-backed query ascending by (latest hash-green
    round, name) — so the stalest cohort rotates in every round."""
    pinned = [n for n in _PINNED if n in names]
    for n in pinned:
        assert n in oracles, f"pinned window entry lacks an oracle: {n}"
    rot = sorted(
        (n for n in names if n in oracles and n not in set(pinned)),
        key=lambda n: (LAST_GREEN.get(n, 0), n),
    )
    return (pinned + rot)[:_WINDOW_SLOTS]


def build_catalog() -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}

    queries["a1_reconciliation_summary"] = reconciliation_summary
    oracles["a1_reconciliation_summary"] = RECONCILIATION_SUMMARY_SQL

    for module in _registered_modules():
        for name, fn in module.QUERIES.items():
            assert name not in queries, f"duplicate query name {name}"
            queries[name] = fn
        for name, sql in getattr(module, "ORACLES", {}).items():
            assert name in module.QUERIES, f"oracle without query: {name}"
            oracles[name] = sql

    ordered: dict[str, QueryFn] = {}
    for name in _window(list(queries), oracles):
        ordered[name] = queries[name]
    for name, fn in queries.items():
        if name not in ordered:
            ordered[name] = fn
    return ordered, oracles


def _registered_modules():
    mods = [relational]
    for modname in (
        "scalar", "scalar2", "relational2", "relational3", "relational4",
        "relational5", "relational6", "relational7", "relational8",
        "relational9", "relational10", "sql_twins", "profiling", "timeseries",
        "quality",
        "skew", "sessions", "textops", "dedup", "curation", "similarity", "pq",
        "vecindex", "graphann", "layout", "topk",
        "multimodal", "pdfops", "docxops", "xlsxops", "mailops", "rtfops",
        "cfbops", "wordops", "biffops", "pptops", "archiveops",
        "incremental", "inference", "rest_fetch", "canonical",
        "soap_fetch",
    ):
        mod = __import__(
            f"caseguarddatapipeline_spark.operators.{modname}",
            fromlist=[modname],
        )
        mods.append(mod)
    return mods
