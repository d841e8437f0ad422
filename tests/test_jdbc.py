"""S7/S8 JDBC connector pair: scan option contract + a REAL upsert round
trip against sqlite (which shares Postgres' ON CONFLICT syntax), including
the T9 idempotence property at the sink."""

from __future__ import annotations

import sqlite3
from functools import partial

import pytest

from caseguarddatapipeline_spark.sources.jdbc import (
    jdbc_scan_options,
    jdbc_upsert,
    upsert_statement,
)

URL = "jdbc:postgresql://db:5432/caseflow"


def test_scan_options_partitioned():
    opts = jdbc_scan_options(
        URL,
        table="cases",
        partition_column="case_id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=64,
        fetch_size=5_000,
        driver="org.postgresql.Driver",
    )
    assert opts == {
        "url": URL,
        "dbtable": "cases",
        "partitionColumn": "case_id",
        "lowerBound": "0",
        "upperBound": "1000000",
        "numPartitions": "64",
        "fetchsize": "5000",
        "driver": "org.postgresql.Driver",
    }


def test_scan_options_query_form_and_errors():
    opts = jdbc_scan_options(URL, query="SELECT * FROM cases WHERE d > ?")
    assert opts["query"].startswith("SELECT")
    with pytest.raises(ValueError):
        jdbc_scan_options(URL)  # neither
    with pytest.raises(ValueError):
        jdbc_scan_options(URL, query="q", table="t")  # both
    with pytest.raises(ValueError):
        jdbc_scan_options(URL, query="q", partition_column="id")
    with pytest.raises(ValueError):
        jdbc_scan_options(URL, table="t", partition_column="id")  # no bounds


def test_upsert_statement_shape():
    stmt = upsert_statement(
        "case_watermarks",
        ["tenant_id", "case_ref", "last_serialno", "updated_at"],
        ["tenant_id", "case_ref"],
    )
    assert stmt == (
        "INSERT INTO case_watermarks "
        "(tenant_id, case_ref, last_serialno, updated_at) "
        "VALUES (?, ?, ?, ?) "
        "ON CONFLICT (tenant_id, case_ref) DO UPDATE SET "
        "last_serialno = EXCLUDED.last_serialno, "
        "updated_at = EXCLUDED.updated_at"
    )
    assert upsert_statement("t", ["k"], ["k"]).endswith("DO NOTHING")


def test_jdbc_upsert_roundtrip_idempotent(spark, tmp_path):
    db = tmp_path / "sink.db"
    conn = sqlite3.connect(db)
    conn.execute(
        "CREATE TABLE watermarks (entity_id INTEGER PRIMARY KEY, "
        "serialno INTEGER, status TEXT)"
    )
    conn.executemany(
        "INSERT INTO watermarks VALUES (?, ?, ?)",
        [(1, 10, "stale"), (2, 20, "stale")],
    )
    conn.commit()
    conn.close()

    updates = spark.createDataFrame(
        [(2, 25, "fresh"), (3, 30, "fresh")],
        "entity_id long, serialno long, status string",
    ).coalesce(1)  # sqlite allows one writer; Postgres takes all partitions

    factory = partial(sqlite3.connect, str(db))
    for _ in range(2):  # T9: re-applying the same updates is a no-op
        jdbc_upsert(updates, "watermarks", ["entity_id"], factory)
        rows = sorted(
            sqlite3.connect(db).execute("SELECT * FROM watermarks").fetchall()
        )
        assert rows == [(1, 10, "stale"), (2, 25, "fresh"), (3, 30, "fresh")]


def test_jdbc_upsert_validates_keys(spark):
    df = spark.createDataFrame([(1,)], "a long")
    with pytest.raises(ValueError):
        jdbc_upsert(df, "t", ["missing"], lambda: None)


def test_jdbc_scan_roundtrip_embedded_derby(spark, tmp_path):
    """S7 integration: the partitioned jdbc_scan contract EXECUTED
    end-to-end against an embedded Derby database (the Derby driver
    ships on Spark's classpath), no network: Spark's JDBC writer
    populates the table, jdbc_scan reads it back with a 4-way
    partitioned stride and a pushed filter."""
    url = f"jdbc:derby:{tmp_path}/s7db;create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    src = spark.range(0, 100).selectExpr(
        "id AS case_id", "CAST(id * 7 % 13 AS INT) AS serialno"
    )
    (src.write.format("jdbc")
        .option("url", url).option("dbtable", "CASES").option("driver", driver)
        .mode("overwrite").save())

    from caseguarddatapipeline_spark.sources.jdbc import jdbc_scan

    df = jdbc_scan(
        spark, url, table="CASES",
        partition_column="case_id", lower_bound=0, upper_bound=100,
        num_partitions=4, driver=driver,
    )
    assert df.rdd.getNumPartitions() == 4
    rows = {r["case_id"]: r["serialno"] for r in df.collect()}
    assert len(rows) == 100 and all(rows[i] == i * 7 % 13 for i in range(100))
    # predicate pushes into the remote query (PushedFilters on the scan)
    plan = df.filter("case_id < 10")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "case_id" in plan
