"""CRM ↔ store reconciliation — the engine's flagship query.

Re-expresses the reference's daily sync (etl/flows/sync_daily.py:324-435,
etl/reconciliation.py:68-141, database/change_tracking.py:154-246) as ONE
declarative DataFrame query. The reference does four sequential set
operations over Python sets (new = crm - db, deactivated = db - crm,
intersection, then a batched serialno watermark check with IN-lists of 100);
here it is a single full-outer join with change-type tagging — Catalyst picks
the join strategy, and the watermark theta-predicate rides on the same join.

Stand-in mapping (FIXTURES.md §B): the "CRM side" is the latest activity
snapshot derived from ``events`` (per-user max event serial); the "DB side"
is a stored-state snapshot derived from ``customer`` with a deterministic
watermark column. Change types mirror reconciliation.py:89-141:
  new          — entity seen upstream, absent in store       (J1 anti-join)
  deactivated  — entity in store, absent upstream            (J2 anti-join)
  update       — in both, upstream serial > stored watermark (J4 theta join)
  unchanged    — in both, no watermark advance

Scale notes: both sides shuffle once on the entity key; at 100 TB the store
side is bucketed by entity key so the join is shuffle-free on one side, and
the summary aggregation is a near-free partial/final hash agg on a
low-cardinality tag column. No driver-side set materialization (the
reference pulls every case_ref into Python lists — that is the anti-pattern
this engine removes).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources import load_table


def crm_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upstream (CRM) activity snapshot: latest serial + activity stats.

    Mirrors the adapter scan side of sync_daily_enhanced.py:71-127: one row
    per upstream entity with its high-watermark serial (max event_id stands
    in for Proclaim's per-case serialno).
    """
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(F.col("user_id").alias("entity_id")).agg(
        F.max("event_id").alias("crm_serialno"),
        F.count(F.lit(1)).alias("crm_event_count"),
    )


def store_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-store state: one row per known entity with stored watermark.

    Mirrors the Postgres-side scan (sync_daily_enhanced.py:156-197). The
    stored watermark is a deterministic function of the key so Spark and the
    DuckDB oracle agree exactly (FIXTURES.md §D forbids cross-engine hashes).
    """
    customer = load_table(spark, sf_dir, "customer")
    crm = crm_snapshot(spark, sf_dir)
    # Store state is synthesized deterministically from the key so every
    # reconciliation outcome materializes at any scale factor:
    #   c_custkey % 11 == 3  → not in store at all  ⇒ "new" upstream
    #   c_custkey % 3  == 0  → watermark caught up   ⇒ "unchanged"
    #   otherwise            → watermark behind by 5 ⇒ "update"
    # Customers with no upstream events ⇒ "deactivated".
    return (
        customer.filter((F.col("c_custkey") % F.lit(11)) != F.lit(3))
        .join(crm, customer.c_custkey == crm.entity_id, "left")
        .select(
            F.col("c_custkey").alias("entity_id"),
            F.when(
                (F.col("c_custkey") % F.lit(3)) == F.lit(0),
                F.coalesce(F.col("crm_serialno"), F.lit(0)),
            )
            .otherwise(F.coalesce(F.col("crm_serialno"), F.lit(0)) - F.lit(5))
            .alias("stored_serialno"),
            ((F.col("c_custkey") % F.lit(7)) != F.lit(0)).alias("is_active"),
        )
    )


def reconcile(crm: DataFrame, store: DataFrame) -> DataFrame:
    """Full-outer reconciliation with change-type tagging (row level)."""
    joined = crm.join(store, "entity_id", "full_outer")
    return joined.select(
        "entity_id",
        F.when(F.col("stored_serialno").isNull(), F.lit("new"))
        .when(F.col("crm_serialno").isNull(), F.lit("deactivated"))
        .when(
            F.col("crm_serialno") > F.coalesce(F.col("stored_serialno"), F.lit(0)),
            F.lit("update"),
        )
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
        F.coalesce(F.col("crm_serialno"), F.lit(0)).alias("crm_serialno"),
        F.coalesce(F.col("stored_serialno"), F.lit(0)).alias("stored_serialno"),
        F.coalesce(F.col("crm_event_count"), F.lit(0)).alias("crm_event_count"),
    )


def reconcile_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass reconciliation detail: equivalent to
    ``reconcile(crm_snapshot(...), store_snapshot(...))`` but with the
    store's synthesized watermark computed AFTER one full-outer join, so
    the events aggregation runs once instead of twice (the compositional
    form scans+aggregates events on both sides of the join — column
    pruning makes the two subplans differ, defeating exchange reuse).
    One scan of each table, one agg, one join."""
    crm = crm_snapshot(spark, sf_dir)
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter((F.col("c_custkey") % F.lit(11)) != F.lit(3))
        .select("c_custkey")
    )
    joined = crm.join(cust, crm.entity_id == cust.c_custkey, "full_outer")
    stored = F.when(
        F.col("c_custkey").isNull(), F.lit(None).cast("long")
    ).otherwise(
        F.when(
            (F.col("c_custkey") % F.lit(3)) == F.lit(0),
            F.coalesce(F.col("crm_serialno"), F.lit(0)),
        ).otherwise(F.coalesce(F.col("crm_serialno"), F.lit(0)) - F.lit(5))
    )
    return joined.select(
        F.coalesce(F.col("entity_id"), F.col("c_custkey")).alias("entity_id"),
        F.when(F.col("c_custkey").isNull(), F.lit("new"))
        .when(F.col("crm_serialno").isNull(), F.lit("deactivated"))
        .when(F.col("crm_serialno") > F.coalesce(stored, F.lit(0)), F.lit("update"))
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
        F.coalesce(F.col("crm_serialno"), F.lit(0)).alias("crm_serialno"),
        F.coalesce(stored, F.lit(0)).alias("stored_serialno"),
        F.coalesce(F.col("crm_event_count"), F.lit(0)).alias("crm_event_count"),
    )


def reconciliation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counts per change type — the ReconciliationResult analog.

    Matches reconciliation.py:27-35 (new/deactivated/updates/unchanged
    counts) plus the mean upstream activity per bucket. Built on the fused
    single-pass detail plan."""
    detail = reconcile_fused(spark, sf_dir)
    return detail.groupBy("change_type").agg(
        F.count(F.lit(1)).alias("n_entities"),
        F.sum("crm_event_count").alias("total_events"),
        F.round(F.avg("crm_serialno"), 4).alias("avg_crm_serialno"),
    )


RECONCILIATION_SUMMARY_SQL = """
WITH crm AS (
    SELECT user_id AS entity_id,
           max(event_id) AS crm_serialno,
           count(*) AS crm_event_count
    FROM events GROUP BY user_id
), store AS (
    SELECT c_custkey AS entity_id,
           CASE WHEN c_custkey % 3 = 0 THEN coalesce(crm.crm_serialno, 0)
                ELSE coalesce(crm.crm_serialno, 0) - 5 END AS stored_serialno,
           (c_custkey % 7) <> 0 AS is_active
    FROM customer LEFT JOIN crm ON c_custkey = crm.entity_id
    WHERE c_custkey % 11 <> 3
), tagged AS (
    SELECT coalesce(crm.entity_id, store.entity_id) AS entity_id,
           CASE WHEN store.entity_id IS NULL THEN 'new'
                WHEN crm.entity_id IS NULL THEN 'deactivated'
                WHEN crm.crm_serialno > coalesce(store.stored_serialno, 0) THEN 'update'
                ELSE 'unchanged' END AS change_type,
           coalesce(crm.crm_serialno, 0) AS crm_serialno,
           coalesce(crm.crm_event_count, 0) AS crm_event_count
    FROM crm FULL OUTER JOIN store ON crm.entity_id = store.entity_id
)
SELECT change_type,
       count(*) AS n_entities,
       CAST(sum(crm_event_count) AS BIGINT) AS total_events,
       round(avg(crm_serialno), 4) AS avg_crm_serialno
FROM tagged GROUP BY change_type
"""
# NB oracle convention (applies to every oracle in this package): DuckDB
# sum(BIGINT) widens to HUGEINT/DECIMAL — always CAST back to BIGINT so the
# value-hash type-matches Spark's long sums.
