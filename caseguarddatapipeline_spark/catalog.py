"""Assembles the engine's query catalog: name → (spark fn, oracle SQL).

The driver contract (``__spark_entry__.py``) exposes exactly this catalog.
Modules register their QUERIES/ORACLES dicts here; a query without an oracle
gets the driver's weaker rows-only check (reserved for genuinely
non-SQL-expressible operators — hash-based near-dup candidates, pandas-UDF
inference stubs, stateful streaming).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import relational
from .operators.reconcile import RECONCILIATION_SUMMARY_SQL, reconciliation_summary

QueryFn = Callable[[SparkSession, str], DataFrame]


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

    return queries, oracles


def _registered_modules():
    mods = [relational]
    for modname in ("scalar", "scalar2", "relational2", "relational3", "relational4",
                    "relational5", "relational6", "relational7", "relational8", "relational9", "relational10", "sql_twins", "profiling", "timeseries", "skew", "sessions",
                    "textops", "dedup", "curation", "similarity", "multimodal",
                    "incremental", "inference"):
        try:
            mod = __import__(
                f"caseguarddatapipeline_spark.operators.{modname}",
                fromlist=[modname],
            )
            mods.append(mod)
        except ImportError:
            pass
    return mods
