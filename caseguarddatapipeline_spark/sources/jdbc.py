"""JDBC connector pair (S7/S8, SURVEY.md §2.1): partitioned database scan
and a batched ON CONFLICT upsert sink.

The reference's database side is Postgres SQL: the daily sync reads case
rows with bounded queries (etl/flows/sync_daily_enhanced.py:156-197) and
writes watermarks/case state back with ``INSERT … ON CONFLICT (key) DO
UPDATE`` (database/change_tracking.py:352-394). The Spark-first shapes:

- **S7 scan** — ``spark.read.jdbc`` with an explicit partition column +
  bounds: the classic parallel ingest (one executor connection per
  stride). Catalyst pushes filters and column pruning into the remote
  query (``PushedFilters`` on a JDBCRelation scan), so a predicate on the
  canonical frame becomes a WHERE clause server-side.
- **S8 upsert sink** — Spark's JDBC writer has only append/overwrite, so
  the upsert runs as ``foreachPartition``: each partition opens one
  connection from an injectable DB-API factory and executes batched
  ``INSERT … ON CONFLICT DO UPDATE`` statements — exactly the
  reference's statement shape, parallelized per partition. The factory
  seam is what makes the sink testable without a warehouse (the test
  suite drives it against sqlite, which shares the ON CONFLICT syntax)
  and is where a pgbouncer/pool hook lands in production.

The pure-DataFrame MERGE twin (operators/incremental.py:merge_upsert)
stays the transformation core; this module is the IO edge.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession


def jdbc_scan_options(
    url: str,
    query: str | None = None,
    table: str | None = None,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
    driver: str | None = None,
) -> dict[str, str]:
    """Build the option map for a JDBC read (separated from the read call
    so the planning contract is unit-testable without a driver jar).

    ``query`` wraps an arbitrary SQL text as the source (the reference's
    bounded sync queries); ``table`` names a relation and is required when
    using ``partition_column`` (Spark forbids query+partitionColumn).
    """
    if (query is None) == (table is None):
        raise ValueError("exactly one of query= or table= is required")
    opts: dict[str, str] = {"url": url, "fetchsize": str(fetch_size)}
    if query is not None:
        if partition_column is not None:
            raise ValueError(
                "partition_column requires table=; Spark rejects "
                "query+partitionColumn (wrap the query in a subquery table)"
            )
        opts["query"] = query
    else:
        opts["dbtable"] = table  # type: ignore[assignment]
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partitioned scan needs lower_bound, upper_bound, num_partitions"
            )
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    if driver is not None:
        opts["driver"] = driver
    return opts


def jdbc_scan(spark: SparkSession, url: str, **kwargs) -> DataFrame:
    """S7: parallel JDBC scan (sync_daily_enhanced.py:156-197's read side).

    ``jdbc_scan(spark, url, table="cases", partition_column="case_id",
    lower_bound=0, upper_bound=10_000_000, num_partitions=64)`` opens 64
    executor-side connections each reading one stride; filters and column
    pruning push down into the generated per-stride WHERE clause.
    """
    return spark.read.format("jdbc").options(**jdbc_scan_options(url, **kwargs)).load()


_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]{0,127}(\.[A-Za-z_][A-Za-z0-9_]{0,127})?")


def upsert_statement(
    table: str,
    columns: Sequence[str],
    key_columns: Sequence[str],
    placeholder: str = "?",
) -> str:
    """The reference's upsert statement (change_tracking.py:352-394):
    ``INSERT … ON CONFLICT (keys) DO UPDATE SET col = EXCLUDED.col`` for
    every non-key column. Postgres and sqlite share this syntax; the
    placeholder flips to ``%s`` for psycopg2.

    Identifiers interpolate into SQL, and in this multi-tenant pipeline
    column names can derive from tenant field mappings — every
    identifier is validated against a strict pattern so a hostile or
    malformed mapping cannot splice SQL into the statement executed on
    every executor connection. (Validation, not quoting: quoted
    identifiers change case-folding semantics per database.)"""
    for ident in [table, *columns, *key_columns]:
        if not _IDENT_RE.fullmatch(ident):
            raise ValueError(f"invalid SQL identifier: {ident!r}")
    non_key = [c for c in columns if c not in key_columns]
    if not non_key:
        conflict_action = "DO NOTHING"
    else:
        sets = ", ".join(f"{c} = EXCLUDED.{c}" for c in non_key)
        conflict_action = f"DO UPDATE SET {sets}"
    cols = ", ".join(columns)
    vals = ", ".join([placeholder] * len(columns))
    keys = ", ".join(key_columns)
    return (
        f"INSERT INTO {table} ({cols}) VALUES ({vals}) "
        f"ON CONFLICT ({keys}) {conflict_action}"
    )


def jdbc_upsert(
    df: DataFrame,
    table: str,
    key_columns: Sequence[str],
    connection_factory: Callable[[], object],
    *,
    batch_size: int = 1_000,
    placeholder: str = "?",
) -> None:
    """S8: batched ON CONFLICT upsert sink.

    Each DataFrame partition opens ONE connection from
    ``connection_factory`` (a picklable zero-arg callable returning a
    DB-API connection — psycopg2.connect wrapper in production, sqlite3
    in tests), executes the upsert in ``batch_size`` chunks via
    ``executemany``, and commits once per partition. Idempotent by
    construction (T9): re-applying the same rows re-asserts the same
    state. Partition-parallel like the scan; key-skew is irrelevant
    because conflicts resolve row-wise server-side.

    Upstream should ``dropDuplicates(key_columns)`` first if the batch
    can contain the same key twice — Postgres raises "cannot affect row
    a second time" inside one statement batch otherwise (the reference
    dedups in Python before executing, change_tracking.py:352-367).
    """
    columns = list(df.columns)
    keys = list(key_columns)
    missing = [k for k in keys if k not in columns]
    if missing:
        raise ValueError(f"key columns not in DataFrame: {missing}")
    stmt = upsert_statement(table, columns, keys, placeholder)

    def _write_partition(rows) -> None:
        conn = connection_factory()
        try:
            cur = conn.cursor()
            batch: list[tuple] = []
            for row in rows:
                batch.append(tuple(row[c] for c in columns))
                if len(batch) >= batch_size:
                    cur.executemany(stmt, batch)
                    batch.clear()
            if batch:
                cur.executemany(stmt, batch)
            conn.commit()
        finally:
            conn.close()

    df.foreachPartition(_write_partition)
