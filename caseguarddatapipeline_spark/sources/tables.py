"""Parquet table sources for the synthetic star schema.

Mirrors the reference's scan surface (SURVEY.md §2.1): the CSV/REST/JDBC case
scans (crm/discovery.py:193-232, etl/flows/sync_daily_enhanced.py:156-197 in
the reference) become declarative parquet scans so Catalyst gets predicate
pushdown, column pruning and partition pruning for free.

Scale notes: at 100 TB these tables are directory-partitioned (cases by
tenant_id/date, events by date) and the same loaders work unchanged —
``spark.read.parquet`` over a partitioned layout prunes partitions from the
pushed filters. Nothing here collects to the driver.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..session import apply_runtime_confs

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# Plan cache: re-loading the same table re-reads parquet footers and re-runs
# analysis (~tens of ms per table per query); DataFrames are immutable plans
# so reuse across queries in a session is free. Keyed by session identity —
# plans are not portable across sessions.
_TABLE_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table, normalizing types at the edge.

    ``events.ts`` is stored as parquet INT64 TIMESTAMP(NANOS); Spark reads it
    (under the nanosAsLong legacy conf) as a long which we cast to a
    microsecond TimestampNTZ — matching DuckDB's read of the same file and
    keeping all downstream timestamp arithmetic timezone-free.
    """
    key = (id(spark), os.path.abspath(sf_dir), name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    apply_runtime_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.floor(F.col("ts") / F.lit(1000)).cast("long")).cast(
                "timestamp_ntz"
            ),
        )
    _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so queries can use spark.sql."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
