"""Scalar layer, part 2: text assembly, truncation, JSON encode, heuristic
scoring, duration metrics, base64, map construction (F6/F7/F10/F13/F15/F16,
N4 — SURVEY.md §2.6-2.7).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources import load_table


def f6_summary_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Summary-text assembly (embedder.py:76-136): labeled concat of entity
    fields + the latest-3 event types joined ', ' — the text that feeds the
    embedding operator. Window-free: per-entity sort_array over collected
    (ts, id, type) structs keeps ordering deterministic."""
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    recent = (
        events.groupBy("user_id")
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", "event_type")),
                    asc=False,
                ),
                1,
                3,
            ).alias("top3")
        )
        .select(
            "user_id",
            F.array_join(
                F.transform(F.col("top3"), lambda s: s["event_type"]), ", "
            ).alias("recent_events"),
        )
    )
    return customer.join(recent, customer.c_custkey == recent.user_id).select(
        "c_custkey",
        F.concat(
            F.lit("Case "),
            F.col("c_custkey").cast("string"),
            F.lit(". Segment: "),
            F.col("c_mktsegment"),
            F.lit(". Recent activity: "),
            F.col("recent_events"),
        ).alias("summary_text"),
    )


def f7_token_budget_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncation to an embedding token budget (embedder.py:148-151):
    cut at 200 chars (~50 tokens × 4 chars), flag truncated docs."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.substring(F.col("text"), 1, 200).alias("truncated"),
        F.length(F.substring(F.col("text"), 1, 200)).alias("kept_chars"),
        (F.length("text") > 200).alias("was_truncated"),
    )


def f10_json_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Job-payload JSON encoding (sync_daily.py:265-275): to_json over a
    struct. String/int fields only — float JSON rendering differs across
    engines."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    return orders.select(
        "o_orderkey",
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("case_id"),
                F.col("o_orderstatus").alias("status"),
                F.col("o_orderpriority").alias("priority"),
            )
        ).alias("payload"),
    )


def f13_settlement_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Settlement-likelihood heuristic (status_detector.py:153-199):
    additive rules over status text + activity volume, clamped [0.05,0.95]."""
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    activity = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    joined = orders.join(
        activity, orders.o_custkey == activity.user_id, "left"
    ).withColumn("n_events", F.coalesce(F.col("n_events"), F.lit(0)))
    base = (
        F.when(F.col("o_orderstatus") == "F", 0.7)
        .when(F.col("o_orderstatus") == "P", 0.5)
        .otherwise(0.3)
    )
    bump = F.least(F.col("n_events").cast("double") / 100.0, F.lit(0.2)) + F.when(
        F.col("o_orderpriority").startswith("1"), 0.1
    ).otherwise(0.0)
    return joined.select(
        "o_orderkey",
        F.round(
            F.least(F.greatest(base + bump, F.lit(0.05)), F.lit(0.95)), 6
        ).alias("settlement_likelihood"),
    )


def f15_duration_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flow duration metrics (process_case.py:418-419, worker.py:171):
    per-entity first→last activity span in seconds."""
    events = load_table(spark, sf_dir, "events")
    span_us = F.unix_micros(F.max("ts").cast("timestamp")) - F.unix_micros(
        F.min("ts").cast("timestamp")
    )
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(span_us / F.lit(1e6), 4).alias("duration_sec"),
    )


def f16_base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base64 encode/decode (client.py:71 Basic-auth, soap filedata):
    encode a text prefix, decode it back, assert the round trip."""
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.substring(F.col("text"), 1, 24)
    b64 = F.base64(F.encode(prefix, "utf-8"))
    return docs.select(
        "doc_id",
        b64.alias("encoded"),
        F.decode(F.unbase64(b64), "utf-8").alias("decoded"),
        (F.decode(F.unbase64(b64), "utf-8") == prefix).alias("roundtrip_ok"),
    )


def n4_map_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata map construction + scalar coercion (embedder.py:165-240:
    Pinecone metadata must be scalar-valued): build map<string,string>,
    retrieve typed fields back out."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    meta = F.create_map(
        F.lit("case_id"), F.col("o_orderkey").cast("string"),
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("price_band"),
        F.when(F.col("o_totalprice") >= 100000, F.lit("high")).otherwise(F.lit("low")),
    )
    return orders.select(
        "o_orderkey",
        F.element_at(meta, "status").alias("meta_status"),
        F.element_at(meta, "price_band").alias("meta_price_band"),
        F.element_at(meta, "case_id").cast("bigint").alias("meta_case_id"),
        F.size(meta).alias("n_meta_keys"),
    )


QUERIES = {
    "f6_summary_assembly": f6_summary_assembly,
    "f7_token_budget_truncation": f7_token_budget_truncation,
    "f10_json_encode": f10_json_encode,
    "f13_settlement_heuristic": f13_settlement_heuristic,
    "f15_duration_metrics": f15_duration_metrics,
    "f16_base64_roundtrip": f16_base64_roundtrip,
    "n4_map_metadata": n4_map_metadata,
}

ORACLES = {
    "f6_summary_assembly": """
        WITH recent AS (
            SELECT user_id,
                   array_to_string(
                     list_transform(
                       (list(struct_pack(ts := ts, event_id := event_id,
                                         event_type := event_type)
                             ORDER BY ts DESC, event_id DESC))[1:3],
                       s -> s.event_type), ', ') AS recent_events
            FROM events GROUP BY user_id
        )
        SELECT c_custkey,
               'Case ' || CAST(c_custkey AS VARCHAR) || '. Segment: ' || c_mktsegment
                 || '. Recent activity: ' || recent_events AS summary_text
        FROM customer JOIN recent ON c_custkey = user_id
    """,
    "f7_token_budget_truncation": """
        SELECT doc_id,
               substr(text, 1, 200) AS truncated,
               CAST(length(substr(text, 1, 200)) AS INT) AS kept_chars,
               (length(text) > 200) AS was_truncated
        FROM documents
    """,
    "f10_json_encode": """
        SELECT o_orderkey,
               '{"case_id":' || CAST(o_orderkey AS VARCHAR)
                 || ',"status":"' || o_orderstatus
                 || '","priority":"' || o_orderpriority || '"}' AS payload
        FROM orders WHERE o_orderkey < 300
    """,
    "f13_settlement_heuristic": """
        WITH activity AS (
            SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
        )
        SELECT o_orderkey,
               round(least(greatest(
                 (CASE WHEN o_orderstatus = 'F' THEN 0.7
                       WHEN o_orderstatus = 'P' THEN 0.5
                       ELSE 0.3 END)
                 + least(CAST(coalesce(n_events, 0) AS DOUBLE) / 100.0, 0.2)
                 + (CASE WHEN o_orderpriority LIKE '1%' THEN 0.1 ELSE 0.0 END),
                 0.05), 0.95), 6) AS settlement_likelihood
        FROM orders LEFT JOIN activity ON o_custkey = user_id
    """,
    "f15_duration_metrics": """
        SELECT user_id, count(*) AS n_events,
               round((epoch_us(CAST(max(ts) AS TIMESTAMP))
                      - epoch_us(CAST(min(ts) AS TIMESTAMP))) / 1e6, 4) AS duration_sec
        FROM events GROUP BY user_id
    """,
    "f16_base64_roundtrip": """
        SELECT doc_id,
               to_base64(encode(substr(text, 1, 24))) AS encoded,
               substr(text, 1, 24) AS decoded,
               TRUE AS roundtrip_ok
        FROM documents
    """,
    "n4_map_metadata": """
        SELECT o_orderkey,
               o_orderstatus AS meta_status,
               CASE WHEN o_totalprice >= 100000 THEN 'high' ELSE 'low' END AS meta_price_band,
               o_orderkey AS meta_case_id,
               3 AS n_meta_keys
        FROM orders WHERE o_orderkey < 300
    """,
}
