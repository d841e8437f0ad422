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

# First 50 = the driver's CORRECTNESS window. Flagship + bench headliners +
# ALL of e1/e2/e5 + one representative per SURVEY §2 family (J4, A6, W2, F1,
# F11, N2, U1-U3, T2/T9, S, P) + this round's new operators.
_PRIORITY = [
    "a1_reconciliation_summary",
    "a1_reconciliation_summary_sql",
    "q1_pricing_summary_sql",
    "q3_shipping_priority_sql",
    "q5_regional_volume_sql",
    "q18_large_orders_sql",
    "j5_brand_revenue",
    "a5_group_stats",
    "a6_hourly_throughput",
    "w2_recent_events_per_entity",
    "f11_json_decode_validate",
    "e3_quality_score",
    "e4_multimodal_join",
    # E1 dedup family — complete
    "e1_exact_dedup",
    "e1_dedup_stats",
    "e1_embedding_neardup",
    "e1_ngram_jaccard",
    "e1_minhash_lsh",
    "e1_minhash_lsh_vectorized",
    "e1_simhash",
    "e1_dedup_clusters",
    "e1_fuzzy_name_match",
    # E2 similarity family — complete
    "e2_cosine_topk",
    "e2_knn_per_query",
    "e2_cosine_topk_vectorized",
    "e2_knn_per_query_vectorized",
    "e2_embedding_norms",
    "e2_lsh_buckets",
    "e2_ivf_search",
    # E5 curation family — complete
    "e5_corpus_curation",
    "e5_curation_funnel",
    "e5_train_split",
    "e5_decontaminate",
    "e5_stratified_sample",
    # One representative per §2 family
    "p1_active_filter",
    "j4_watermark_updates",
    "w5_batch_numbering",
    "f1_multiformat_dates",
    "n2_explode_history_filtered",
    "s4_paged_search",
    "u1_insight_extraction",
    "u2_hash_embedding",
    "u3_text_extraction",
    "t2_watermark_advance",
    "t9_idempotent_upsert",
    "e3_language_id",
    "e4_decode_pipeline",
    # Round-2 additions
    "p2_canonical_config",
    "w5_batch_numbering_by_key",
    "s3_rest_case_fetch",
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
    ):
        mod = __import__(
            f"caseguarddatapipeline_spark.operators.{modname}",
            fromlist=[modname],
        )
        mods.append(mod)
    return mods
