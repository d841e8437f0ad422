"""S3 catalog entry: the REST case-fetch stage driven end-to-end with a
deterministic stub client (the U1-U3 pattern — the plumbing is real, the
network call is the injectable seam).

Reference: caseguard/proclaim/client.py:180-221 (per-case GET fan-out),
:160-174 (401 re-auth + retry, modeled by sources/rest.py's Resilient
wrapper)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources import load_table
from ..sources.rest import rest_fetch


def _stub_client():
    """Deterministic fake of an authenticated Proclaim client: payload is
    a delimited record derived from the case number — same arithmetic the
    SQL oracle applies, so the whole fetch+parse pipeline is value-checked."""

    def fetch(case_ref: str) -> str:
        n = int(case_ref.split("-")[1])
        status = "closed" if n % 3 == 0 else "open"
        return f"{status}|{(n * 7) % 1000}"

    return fetch


def s3_rest_case_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fetch a sampled case-ref frame through the REST stage and type the
    payloads: case_ref → (status, serialno). The sample (1/11th of
    customers) models a sync shard; parallelism is the ref frame's
    partitioning."""
    refs = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 11 == 0)
        .select(F.concat(
            # lpad (not %06d): the oracle's lpad TRUNCATES 7+ digit keys
            # to 6 chars while format_string only pads — at sf >= ~7 the
            # two diverge; lpad on both sides keeps the contract exact
            F.lit("NBC-"), F.lpad(F.col("c_custkey").cast("string"), 6, "0")
        ).alias("case_ref"))
    )
    fetched = rest_fetch(refs, _stub_client)
    parts = F.split(F.col("payload"), r"\|")
    return fetched.select(
        "case_ref",
        parts.getItem(0).alias("status"),
        parts.getItem(1).cast("int").alias("serialno"),
        "fetch_status",
    )


QUERIES = {"s3_rest_case_fetch": s3_rest_case_fetch}

ORACLES = {
    "s3_rest_case_fetch": """
        SELECT 'NBC-' || lpad(CAST(c_custkey AS VARCHAR), 6, '0') AS case_ref,
               CASE WHEN c_custkey % 3 = 0 THEN 'closed' ELSE 'open' END AS status,
               CAST((c_custkey * 7) % 1000 AS INT) AS serialno,
               'ok' AS fetch_status
        FROM customer
        WHERE c_custkey % 11 = 0
    """,
}
