"""Relational layer, part 3: remaining §2 inventory entries — canonical /
nested / tenant-scoped projections (P2/P3/P6/P7), IN-list lookup (J6),
status & queue-depth distributions (A8/A11), per-case doc cap (W3), null
normalization and ratio metrics (F18/F20), filtered history explode and
column-append merge (N2/N6), paged search (S4).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources import load_table

# Canonical-field mapping (P2): source column → (canonical name, type).
# Mirrors config/canonical_fields_corrected.json + crm/discovery.py:205-224 —
# a declared schema with extraction rules, applied as one select so Catalyst
# prunes unused source columns at the scan.
CANONICAL_MAP = [
    ("o_orderkey", "case_ref", "string"),
    ("o_orderstatus", "status", "string"),
    ("o_orderpriority", "case_type", "string"),
    ("o_orderdate", "date_opened", "date"),
    ("o_totalprice", "claim_value", "double"),
]


def p2_canonical_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical column projection (crm/discovery.py:205-224,
    smart_field_retriever.py:36-97): mapping-table-driven rename + type
    coercion in a single select — column pruning reaches the scan.
    Currency kept as rounded double (cross-engine decimal reprs drift)."""
    orders = load_table(spark, sf_dir, "orders")
    cols = [F.col(src).cast(typ).alias(dst) for src, dst, typ in CANONICAL_MAP]
    cols[-1] = F.round(F.col("o_totalprice"), 2).alias("claim_value")
    return orders.select(*cols)


def p3_nested_path_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested path navigation (smart_field_retriever.py:311-330): dot-path
    into the JSON payload — get_json_object stays in codegen; no UDF."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
    ).filter(F.col("k_value") >= 50)


def p6_tenant_isolation_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tenant isolation (core/tenant_manager.py:174-188): every read scoped
    by tenant key. Nation 5 stands in for the tenant; with the table
    partitioned by the tenant key this filter becomes partition pruning —
    the scan never touches other tenants' files."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    tenant_customers = customer.filter(F.col("c_nationkey") == 5)
    return (
        orders.join(
            tenant_customers, orders.o_custkey == tenant_customers.c_custkey
        )
        .select("o_orderkey", "o_custkey", "c_nationkey", "o_totalprice")
    )


def p7_significant_event_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Significant-event filter (embedder.py:284-289): keep events whose
    payload text exceeds a length floor, first 10 per entity by recency.
    One shuffle on the entity key (window), filter evaluated map-side."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.filter(F.length(F.concat("event_type", "props")) > 12)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("user_id", "event_id", "event_type", "rn")
    )


def j6_inlist_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list batch lookup (change_tracking.py:211-241): the reference
    batches `WHERE case_ref IN (…)` by 100 to bound SQL size; in Spark the
    whole list is one pushed-down isin predicate, no batching."""
    orders = load_table(spark, sf_dir, "orders")
    keys = list(range(1, 26))
    return orders.filter(F.col("o_custkey").isin(keys)).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


def a8_status_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status/priority distribution tallies (status_detector.py:276-279,
    471-476): two grouping columns, one hash agg with map-side partials."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_cases"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_value"),
    )


def a11_queue_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Queue-depth monitor (onboard_tenant.py:255-313): depth per priority
    queue + completion percentage (status 'F' = done stands in)."""
    orders = load_table(spark, sf_dir, "orders")
    queues = orders.select(
        F.when(F.col("o_orderpriority").startswith("1"), 1)
        .when(F.col("o_orderpriority").startswith("2"), 2)
        .otherwise(3)
        .alias("queue"),
        (F.col("o_orderstatus") == "F").alias("done"),
    )
    return queues.groupBy("queue").agg(
        F.count(F.lit(1)).alias("depth"),
        F.count(F.when(~F.col("done"), 1)).alias("jobs_remaining"),
        F.round(
            F.count(F.when(F.col("done"), 1)).cast("double")
            / F.count(F.lit(1))
            * 100,
            4,
        ).alias("completion_pct"),
    )


def w3_doc_cap_per_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-case document cap (process_case.py:187: first 5 manifest docs):
    first 3 lineitems per order by line number — row_number window, the
    shuffle keyed on the case key only."""
    li = load_table(spark, sf_dir, "lineitem")
    # l_linenumber repeats within an order in the synthetic data; the extra
    # keys make the ordering total so the cap is deterministic.
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "rn")
    )


def f18_null_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null/empty normalization (technical-details.md:905-906: '[Empty]' →
    NULL): raw CRM-ish string column synthesized from acctbal, then
    nullif + trim + cast back — the typed-edge pattern."""
    customer = load_table(spark, sf_dir, "customer")
    raw = customer.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, F.lit("  [Empty]  "))
        .otherwise(F.col("c_acctbal").cast("string"))
        .alias("raw_balance"),
    )
    return raw.select(
        "c_custkey",
        F.nullif(F.trim("raw_balance"), F.lit("[Empty]"))
        .cast("double")
        .alias("balance"),
        F.trim("raw_balance").eqNullSafe("[Empty]").alias("was_empty"),
    )


def f20_ratio_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio/percent metrics (sync_daily.py:402-412 efficiency_ratio,
    reconciliation.py:297-301 change %): per-status share of total via a
    window sum over the already-aggregated (tiny) frame — no second scan."""
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_cases"),
        F.sum("o_totalprice").alias("total_value"),
    )
    w = Window.partitionBy()
    return counts.select(
        "o_orderstatus",
        "n_cases",
        F.round("total_value", 2).alias("total_value"),
        F.round(
            F.col("n_cases").cast("double") / F.sum("n_cases").over(w) * 100, 4
        ).alias("pct_of_cases"),
        F.round(F.col("total_value") / F.sum("total_value").over(w) * 100, 4).alias(
            "pct_of_value"
        ),
    )


def n2_explode_history_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered history explode (embedder.py:284-314): latest-5 events per
    entity collected, sliced, posexploded with event_index, then the
    significance filter — the detail-vector fan-out shape. collect_list +
    slice keeps only 5 structs per key in the agg state (bounded memory),
    vs a window that ranks every row."""
    events = load_table(spark, sf_dir, "events")
    latest5 = (
        events.groupBy("user_id")
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", "event_type")),
                    asc=False,
                ),
                1,
                5,
            ).alias("history")
        )
        .select(
            "user_id", F.posexplode("history").alias("event_index", "ev")
        )
    )
    return latest5.filter(F.col("ev.event_type") != "view").select(
        "user_id",
        "event_index",
        F.col("ev.event_id").alias("event_id"),
        F.col("ev.event_type").alias("event_type"),
    )


def n6_column_append_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-output dict merge (process_case.py:109-124: {**case, new}):
    enrichment columns appended while preserving the input row — pure
    projection, zero shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.when(F.col("o_totalprice") >= 200000, "high")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("low")
        .alias("value_band"),
        (F.col("o_orderstatus") != "F").alias("needs_processing"),
    )


def s4_paged_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paged case search (client.py:262-291: search_cases(query, limit)):
    predicate + deterministic order + limit — Spark plans the limit as
    TakeOrderedAndProject (per-partition heap, k rows to the driver)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("text").contains("data"))
        .select("doc_id", "source", "lang", "n_chars")
        .orderBy("doc_id")
        .limit(25)
    )


def n7_rebuild_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested REBUILD — the inverse of the N1/N2 explode direction:
    collapse each user's events back into one ordered array<struct>
    history column (the per-case timeline shape the reference fetches as
    a list of dicts, client.py:197-200, materialized FROM the long
    table). Serialized with to_json so the oracle compares bytes:
    Spark's to_json and DuckDB's to_json emit the identical compact
    encoding for array<struct> (verified), which sidesteps cross-engine
    struct rendering. One shuffle on user_id; sort_array orders by the
    struct fields (ts, event_id) so the array order is total and
    engine-exact."""
    events = load_table(spark, sf_dir, "events")
    item = F.struct(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.col("event_id").alias("eid"),
        F.col("event_type").alias("et"),
    )
    return (
        events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.to_json(F.sort_array(F.collect_list(item))).alias("history"),
        )
    )


QUERIES = {
    "n7_rebuild_history": n7_rebuild_history,
    "p2_canonical_projection": p2_canonical_projection,
    "p3_nested_path_projection": p3_nested_path_projection,
    "p6_tenant_isolation_filter": p6_tenant_isolation_filter,
    "p7_significant_event_filter": p7_significant_event_filter,
    "j6_inlist_lookup": j6_inlist_lookup,
    "a8_status_distribution": a8_status_distribution,
    "a11_queue_depth": a11_queue_depth,
    "w3_doc_cap_per_case": w3_doc_cap_per_case,
    "f18_null_normalization": f18_null_normalization,
    "f20_ratio_metrics": f20_ratio_metrics,
    "n2_explode_history_filtered": n2_explode_history_filtered,
    "n6_column_append_merge": n6_column_append_merge,
    "s4_paged_search": s4_paged_search,
}

ORACLES = {
    "n7_rebuild_history": """
        SELECT user_id,
               count(*) AS n_events,
               to_json(list(struct_pack(
                            ts := strftime(ts, '%Y-%m-%d %H:%M:%S'),
                            eid := event_id,
                            et := event_type)
                       ORDER BY strftime(ts, '%Y-%m-%d %H:%M:%S'),
                                event_id, event_type)) AS history
        FROM events GROUP BY user_id
    """,
    "p2_canonical_projection": """
        SELECT CAST(o_orderkey AS VARCHAR) AS case_ref,
               o_orderstatus AS status,
               o_orderpriority AS case_type,
               CAST(o_orderdate AS DATE) AS date_opened,
               round(o_totalprice, 2) AS claim_value
        FROM orders
    """,
    "p3_nested_path_projection": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
    """,
    "p6_tenant_isolation_filter": """
        SELECT o_orderkey, o_custkey, c_nationkey, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_nationkey = 5
    """,
    "p7_significant_event_filter": """
        WITH sig AS (
            SELECT user_id, event_id, event_type,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
            WHERE length(event_type || props) > 12
        )
        SELECT user_id, event_id, event_type, CAST(rn AS INTEGER) AS rn
        FROM sig WHERE rn <= 10
    """,
    "j6_inlist_lookup": """
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE o_custkey IN (1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16,17,
                            18,19,20,21,22,23,24,25)
    """,
    "a8_status_distribution": """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_cases,
               round(avg(o_totalprice), 4) AS avg_value
        FROM orders GROUP BY o_orderstatus, o_orderpriority
    """,
    "a11_queue_depth": """
        WITH q AS (
            SELECT CASE WHEN o_orderpriority LIKE '1%' THEN 1
                        WHEN o_orderpriority LIKE '2%' THEN 2
                        ELSE 3 END AS queue,
                   (o_orderstatus = 'F') AS done
            FROM orders
        )
        SELECT queue,
               count(*) AS depth,
               count(CASE WHEN NOT done THEN 1 END) AS jobs_remaining,
               round(CAST(count(CASE WHEN done THEN 1 END) AS DOUBLE)
                     / count(*) * 100, 4) AS completion_pct
        FROM q GROUP BY queue
    """,
    "w3_doc_cap_per_case": """
        WITH ranked AS (
            SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
                   row_number() OVER (
                       PARTITION BY l_orderkey
                       ORDER BY l_linenumber, l_partkey, l_suppkey
                   ) AS rn
            FROM lineitem
        )
        SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
               CAST(rn AS INTEGER) AS rn
        FROM ranked WHERE rn <= 3
    """,
    "f18_null_normalization": """
        WITH raw AS (
            SELECT c_custkey,
                   CASE WHEN c_acctbal < 0 THEN '  [Empty]  '
                        ELSE CAST(c_acctbal AS VARCHAR) END AS raw_balance
            FROM customer
        )
        SELECT c_custkey,
               CAST(nullif(trim(raw_balance), '[Empty]') AS DOUBLE) AS balance,
               (trim(raw_balance) = '[Empty]') AS was_empty
        FROM raw
    """,
    "f20_ratio_metrics": """
        WITH counts AS (
            SELECT o_orderstatus, count(*) AS n_cases,
                   sum(o_totalprice) AS total_value
            FROM orders GROUP BY o_orderstatus
        )
        SELECT o_orderstatus, n_cases,
               round(total_value, 2) AS total_value,
               round(CAST(n_cases AS DOUBLE) / sum(n_cases) OVER () * 100, 4)
                   AS pct_of_cases,
               round(total_value / sum(total_value) OVER () * 100, 4)
                   AS pct_of_value
        FROM counts
    """,
    "n2_explode_history_filtered": """
        WITH ranked AS (
            SELECT user_id, event_id, event_type,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        )
        SELECT user_id, CAST(rn - 1 AS INTEGER) AS event_index,
               event_id, event_type
        FROM ranked WHERE rn <= 5 AND event_type <> 'view'
    """,
    "n6_column_append_merge": """
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               CASE WHEN o_totalprice >= 200000 THEN 'high'
                    WHEN o_totalprice >= 100000 THEN 'medium'
                    ELSE 'low' END AS value_band,
               (o_orderstatus <> 'F') AS needs_processing
        FROM orders
    """,
    "s4_paged_search": """
        SELECT doc_id, source, lang, n_chars
        FROM documents
        WHERE text LIKE '%data%'
        ORDER BY doc_id LIMIT 25
    """,
}
