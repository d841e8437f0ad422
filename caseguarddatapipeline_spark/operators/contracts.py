"""Table contracts: schema drift detection and snapshot diffing — the
lake-maintenance checks that run before a pipeline trusts its inputs.

- ``schema_drift``: compare a managed table's ACTUAL schema against the
  declared contract (missing / unexpected / retyped columns). The
  reference hard-codes its schema in ORM models (database/models.py);
  a lake has no ORM to fail fast, so the contract check is the gate that
  stops a producer's silent schema change from corrupting downstream
  jobs. Complements a29_expectations (row values) and
  read_merged_schema (tolerant reads) with the STRICT posture.

- ``snapshot_diff``: row-level diff of two snapshots of the same table —
  added / removed / changed-by-key — the regression check a pipeline
  change ships with ("this refactor alters zero output rows"), and the
  audit for an upstream reload. One full-outer join on the key plus a
  hash compare of the non-key columns; at 100 TB both sides shuffle on
  the key once, and the value hash (xxhash64 of all non-key columns)
  avoids carrying wide rows through the join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def schema_drift(
    spark: SparkSession, table_dir: str, contract_ddl: str
) -> dict:
    """Compare the parquet table's schema to ``contract_ddl`` (a DDL
    string like ``"id bigint, name string"``). Returns the drift report;
    ``ok`` is True only with zero drift."""
    from pyspark.sql.types import StructType

    expected = {
        f.name: f.dataType.simpleString()
        for f in StructType.fromDDL(contract_ddl).fields
    }
    actual = {
        f.name: f.dataType.simpleString()
        for f in spark.read.parquet(table_dir).schema.fields
    }
    missing = sorted(set(expected) - set(actual))
    unexpected = sorted(set(actual) - set(expected))
    retyped = sorted(
        (c, expected[c], actual[c])
        for c in set(expected) & set(actual)
        if expected[c] != actual[c]
    )
    return {
        "ok": not (missing or unexpected or retyped),
        "missing": missing,
        "unexpected": unexpected,
        "retyped": retyped,
    }


def snapshot_diff(
    before: DataFrame, after: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Row-level diff keyed on ``key_cols``: one row per differing key
    with status ∈ {added, removed, changed}. Unchanged keys drop out
    before anything wide moves: both sides reduce to (key, value-hash)
    first, so the join carries two longs per row."""
    value_cols = [c for c in before.columns if c not in key_cols]
    assert value_cols and [c for c in after.columns if c not in key_cols] == value_cols

    def keyed(df: DataFrame, side: str) -> DataFrame:
        # NULLs must contribute to the hash: Spark's hash expressions SKIP
        # null inputs (the running seed passes through unchanged), so
        # ('Ann', NULL) and (NULL, 'Ann') would collide and a null-shift
        # change would read as "unchanged". Coalescing every column to a
        # sentinel makes each position always feed the chain.
        return df.select(
            *key_cols,
            F.xxhash64(
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00<NULL>"))
                    for c in value_cols
                ]
            ).alias(f"{side}_hash"),
        )

    joined = keyed(before, "b").join(keyed(after, "a"), key_cols, "full_outer")
    status = (
        F.when(F.col("b_hash").isNull(), "added")
        .when(F.col("a_hash").isNull(), "removed")
        .when(F.col("b_hash") != F.col("a_hash"), "changed")
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*key_cols, "status")
    )


def diff_summary(diff: DataFrame) -> dict:
    """Roll the diff into audit counts."""
    rows = diff.groupBy("status").count().collect()
    out = {"added": 0, "removed": 0, "changed": 0}
    out.update({r["status"]: r["count"] for r in rows})
    out["total_differing"] = sum(out[k] for k in ("added", "removed", "changed"))
    return out
