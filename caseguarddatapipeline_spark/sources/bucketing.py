"""Bucketed-table layout: the co-located join path (SURVEY.md §4, 100 TB
posture for the reconciliation join).

The flagship reconciliation and the watermark theta join rendezvous on the
entity key every sync. On a cluster you pay that shuffle once at write
time: persist both sides bucketed by the key, and every subsequent join
between them is shuffle-free (SortMergeJoin over pre-bucketed scans, no
Exchange). This module wraps the write/read pair; tests assert the
no-Exchange plan property.

Bucketed writes require a table catalog (``saveAsTable``) — plain
``.parquet(path)`` silently drops bucket metadata. The session's default
in-memory catalog + a warehouse dir is enough; no Hive metastore needed.
"""

from __future__ import annotations

import pyspark.sql.functions as F  # noqa: F401  (kept for callers)
from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 8, path: str | None = None
) -> None:
    """Persist ``df`` bucketed+sorted by ``key`` into the session catalog.

    ``path`` makes it an external table — useful when the session's static
    warehouse dir can't be changed (bucket metadata still lands in the
    catalog either way)."""
    writer = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-key bucketed tables — planner emits no Exchange on
    either side (verify with .explain: SortMergeJoin over bucketed scans)."""
    return read_table(spark, left_table).join(read_table(spark, right_table), key)
