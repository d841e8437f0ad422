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
# flagship, the bench headliners, and the full E1/E2/E5 families; round 3
# added the TPC-H shape set and the A/P/J/W/F tails (49/50 green, the one
# red being the q12 oracle-dtype artifact fixed this round). Round 4
# finishes the sweep: every oracle-backed entry that has never had a
# driver-green CORRECTNESS row (36 entries), plus q12 (to record the
# dtype fix green), plus e1_fuzzy_name_match / e1_simhash (reworked this
# round from capped nested-loop pair joins to uncapped blocked equi-joins
# — re-proving them under the new plans), plus 11 continuity slots for
# the flagship and the bench headliners whose serving path changed this
# round (e2 cosine/knn cost-routing). Every rotated-out query stays
# oracle-checked by tools/parity.py and tools/driver_sim.py over the
# FULL catalog. Rows-only entries (e2_ivf_search,
# a16_approx_distinct_users) are deliberately kept out of the window:
# they can never turn a slot green.
_PRIORITY = [
    # Continuity: flagship + bench headliners (driver-green r1-r3;
    # e2 entries re-proven because their kernel routing changed this round)
    "a1_reconciliation_summary",
    "a1_reconciliation_summary_sql",
    "q1_pricing_summary_sql",
    "e1_minhash_lsh_vectorized",
    "e2_cosine_topk_vectorized",
    "e2_knn_per_query_vectorized",
    "e5_corpus_curation",
    "e3_quality_score",
    "e4_multimodal_join",
    "p1_active_filter",
    "t2_watermark_advance",
    # Fix-evidence: red-or-reworked in round 3, must record green now
    "q12_priority_shipping",
    "e1_fuzzy_name_match",
    "e1_simhash",
    # Never-driver-verified: SURVEY §2 base-inventory members
    "p2_canonical_projection",
    "p7_significant_event_filter",
    "p8_stable_sample",
    "a8_status_distribution",
    "a11_queue_depth",
    "w6_listing_sort",
    "w9_rolling_activity",
    "n6_column_append_merge",
    "u5_urgency_score",
    "u6_label_centroids",
    "u7_embedding_chunks",
    "j11_except_snapshots",
    # Never-driver-verified: TPC-H shapes missed by the round-3 window
    "q5_regional_volume",
    "q11_important_stock",
    "q18_large_orders",
    "q20_promo_suppliers",
    # Never-driver-verified: A-family extension tail
    "a17_salted_hotkey_agg",
    "a19_reconciliation_quality",
    "a21_unpivot_metrics",
    "a22_argmax_order",
    "a24_corr_stats",
    "a26_price_trend",
    # Never-driver-verified: temporal operators
    "t10_asof_join",
    "t11_scd2_history",
    "t12_range_join_state",
    # Never-driver-verified: E-family training-data operators
    "e1_embedding_neardup_ivf",
    "e3_token_count",
    "e3_repetition_ratio",
    "e3_doc_fingerprint",
    "e3_tfidf_term",
    "e3_bpe_tokens",
    "e3_ranked_search",
    "e3_pii_scrub",
    "e4_binary_metadata",
    "e4_frame_sample",
    "e5_dedup_rate_by_source",
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
        "quality",
        "skew", "sessions", "textops", "dedup", "curation", "similarity", "pq",
        "layout",
        "multimodal", "incremental", "inference", "rest_fetch", "canonical",
        "soap_fetch",
    ):
        mod = __import__(
            f"caseguarddatapipeline_spark.operators.{modname}",
            fromlist=[modname],
        )
        mods.append(mod)
    return mods
