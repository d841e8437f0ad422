"""S3 REST fetch stage: happy path, dead-letter rows on persistent
failure, and retry-until-success via the Resilient wrapper."""

from __future__ import annotations

import pyspark.sql.functions as F

from caseguarddatapipeline_spark.operators.rest_fetch import s3_rest_case_fetch
from caseguarddatapipeline_spark.sources.rest import rest_fetch


def test_s3_stub_fetch_end_to_end(spark, sf_dir):
    out = s3_rest_case_fetch(spark, sf_dir).collect()
    assert out and all(r["fetch_status"] == "ok" for r in out)
    closed = [r for r in out if int(r["case_ref"].split("-")[1]) % 3 == 0]
    assert closed and all(r["status"] == "closed" for r in closed)
    assert all(r["serialno"] == int(r["case_ref"].split("-")[1]) * 7 % 1000 for r in out)


def test_failed_refs_become_dead_letter_rows(spark):
    refs = spark.createDataFrame(
        [("A-1",), ("POISON-2",), ("A-3",)], "case_ref string"
    )

    def factory():
        def fetch(ref: str) -> str:
            if ref.startswith("POISON"):
                raise RuntimeError("endpoint 500")
            return f"ok-{ref}"

        return fetch

    rows = {
        r["case_ref"]: r
        for r in rest_fetch(
            refs, factory, sleep=lambda _s: None, max_attempts=2
        ).collect()
    }
    assert rows["A-1"]["fetch_status"] == "ok"
    assert rows["A-1"]["payload"] == "ok-A-1"
    assert rows["POISON-2"]["fetch_status"] == "failed"
    assert rows["POISON-2"]["payload"] is None
    assert rows["A-3"]["fetch_status"] == "ok"


def test_transient_failure_retries_to_success(spark):
    refs = spark.createDataFrame([("A-1",)], "case_ref string").coalesce(1)

    def factory():
        calls = {"n": 0}

        def fetch(ref: str) -> str:
            calls["n"] += 1
            if calls["n"] < 3:  # fail twice, succeed on 3rd attempt
                raise RuntimeError("429")
            return f"ok-{ref}@{calls['n']}"

        return fetch

    [row] = rest_fetch(refs, factory, sleep=lambda _s: None).collect()
    assert row["fetch_status"] == "ok"
    assert row["payload"] == "ok-A-1@3"
    # the attempts column carries the REAL retry count from Resilient
    # (fail, fail, success = 3), not a constant
    assert row["attempts"] == 3


def test_attempts_column_reports_exhaustion(spark):
    refs = spark.createDataFrame([("A-1",), ("POISON-2",)], "case_ref string").coalesce(1)

    def factory():
        def fetch(ref: str) -> str:
            if ref.startswith("POISON"):
                raise RuntimeError("endpoint 500")
            return f"ok-{ref}"

        return fetch

    rows = {
        r["case_ref"]: r
        for r in rest_fetch(
            refs, factory, sleep=lambda _s: None, max_attempts=2
        ).collect()
    }
    assert rows["A-1"]["attempts"] == 1
    # dead-letter row shows retry exhaustion: all max_attempts consumed
    assert rows["POISON-2"]["fetch_status"] == "failed"
    assert rows["POISON-2"]["attempts"] == 2


def test_fetch_preserves_row_count(spark, sf_dir):
    df = s3_rest_case_fetch(spark, sf_dir)
    n_refs = (
        df.sparkSession.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_custkey") % 11 == 0)
        .count()
    )
    assert df.count() == n_refs
