"""Skew mitigation: two-phase salted aggregation (the 100 TB hot-key
pattern, SURVEY.md §2.4 scale posture).

The synthetic ``events`` table has only 5 event_type values — the shape of
a production hot-key problem: a plain groupBy("event_type") funnels ~20% of
100 TB through 5 reducers. The salted form aggregates on
(event_type, salt) first — spreading each hot key over SALT_BUCKETS
reducers — then combines the algebraic partials in a second, trivially
small aggregation. Results are exactly equal to the unsalted groupBy for
algebraic aggregates (count/sum/min/max, avg as sum÷count), which the
DuckDB oracle (a plain GROUP BY) verifies.

Spark's own map-side partial aggregation covers this when upstream
partitions are balanced; explicit salting is the tool when single-key
volume exceeds what one final-agg task should own (or when AQE skew-join
splitting cannot apply, e.g. aggregation rather than join skew).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources import load_table

SALT_BUCKETS = 16


def a17_salted_hotkey_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type stats via salted two-phase aggregation; equal to the
    direct GROUP BY (the oracle) by algebraic-aggregate composition.

    Values sum as EXACT micro-unit integers (round(value·10⁶) in both
    engines — the t13/t14 convention): double addition is non-associative,
    so a raw-double salted partial tree could land on the other side of a
    rounding boundary than the oracle's single sequential sum; int64
    micro-units make the salted identity exact by construction, not by
    luck."""
    events = load_table(spark, sf_dir, "events")
    micro = F.round(F.col("value") * 1e6).cast("long")
    salted = events.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(SALT_BUCKETS))
    )
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("p_count"),
        F.sum(micro).alias("p_sum"),
        F.min("value").alias("p_min"),
        F.max("value").alias("p_max"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("p_count").alias("n_events"),
        F.round(F.sum("p_sum") / F.lit(1e6), 4).alias("total_value"),
        F.round(F.sum("p_sum") / (F.sum("p_count") * F.lit(1e6)), 6).alias(
            "avg_value"
        ),
        F.round(F.min("p_min"), 4).alias("min_value"),
        F.round(F.max("p_max"), 4).alias("max_value"),
    )


QUERIES = {
    "a17_salted_hotkey_agg": a17_salted_hotkey_agg,
}

ORACLES = {
    "a17_salted_hotkey_agg": """
        SELECT event_type,
               count(*) AS n_events,
               round(sum(CAST(round(value * 1000000, 0) AS BIGINT))
                     / 1000000.0, 4) AS total_value,
               round(sum(CAST(round(value * 1000000, 0) AS BIGINT))
                     / (count(*) * 1000000.0), 6) AS avg_value,
               round(min(value), 4) AS min_value,
               round(max(value), 4) AS max_value
        FROM events GROUP BY event_type
    """,
}
