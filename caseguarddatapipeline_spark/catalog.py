"""Assembles the engine's query catalog: name → (spark fn, oracle SQL).

The driver contract (``__spark_entry__.py``) exposes exactly this catalog.
Modules register their QUERIES/ORACLES dicts here; a query without an oracle
gets the driver's weaker rows-only check (reserved for genuinely
non-SQL-expressible operators — hash-based near-dup candidates, pandas-UDF
inference stubs, stateful streaming).

Ordering contract: the driver's CORRECTNESS record covers the first 50
catalog entries in registration order, so ``_PRIORITY`` pins the flagship
query, the 16 bench headliners, the full E1/E2/E5 training-data families,
and one representative per SURVEY §2 family into that window. Every other
query follows in module-registration order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import relational
from .operators.reconcile import RECONCILIATION_SUMMARY_SQL, reconciliation_summary

QueryFn = Callable[[SparkSession, str], DataFrame]

# First 50 = the driver's CORRECTNESS window. The window ROTATES across
# rounds so driver-level evidence accumulates over the whole catalog
# instead of re-proving the same 50 queries: rounds 1-2 covered the
# flagship, the bench headliners, and the full E1/E2/E5 families (all
# green — see CORRECTNESS_r01/r02.json); round 3 keeps the flagship and
# one representative per SURVEY §2 family and fills the remaining slots
# with queries that had no green driver row in any prior round (TPC-H
# shapes, the A-family tail, P/J/W/F/N members). Every rotated-out query
# stays oracle-checked by tools/parity.py and tools/driver_sim.py over
# the FULL catalog. Rows-only entries (e2_ivf_search) are deliberately
# kept out of the window: they can never turn a slot green.
_PRIORITY = [
    # Flagship + per-family representatives (driver-green in r1/r2 —
    # continuity evidence that rotation didn't break what was proven)
    "a1_reconciliation_summary",
    "a1_reconciliation_summary_sql",
    "q1_pricing_summary_sql",
    "e1_minhash_lsh_vectorized",
    "e2_knn_per_query_vectorized",
    "e5_corpus_curation",
    "e3_quality_score",
    "e4_multimodal_join",
    "p1_active_filter",
    "j4_watermark_updates",
    "w2_recent_events_per_entity",
    "f1_multiformat_dates",
    "n2_explode_history_filtered",
    "u1_insight_extraction",
    "t2_watermark_advance",
    "s3_rest_case_fetch",
    # Round-3 additions (new operators this round)
    "s5_soap_fetch",
    "u3_format_dispatch",
    "e2_ivf_search_1round",
    # Never-driver-verified before round 3: TPC-H shape set
    "q2_min_cost_supplier",
    "q4_order_priority_check",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q12_priority_shipping",
    "q13_order_count_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q21_waiting_orders_suppliers",
    "q22_dormant_customers",
    # Never-driver-verified: A-family analytics tail
    "a14_cube_counts",
    "a15_distinct_users",
    "a18_value_percentiles",
    "a20_priority_pivot",
    "a23_value_histogram",
    "a25_data_profile",
    "a27_daily_order_spine",
    # Never-driver-verified: P/J/W/F family members
    "p3_nested_path_projection",
    "p6_tenant_isolation_filter",
    "j6_inlist_lookup",
    "j10_intersect_snapshots",
    "w3_doc_cap_per_case",
    "w8_sessionize",
    "f18_null_normalization",
    "f20_ratio_metrics",
]


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
    for name in _PRIORITY:
        if name in queries:
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
        "skew", "sessions", "textops", "dedup", "curation", "similarity",
        "multimodal", "incremental", "inference", "rest_fetch", "canonical",
        "soap_fetch",
    ):
        mod = __import__(
            f"caseguarddatapipeline_spark.operators.{modname}",
            fromlist=[modname],
        )
        mods.append(mod)
    return mods
