"""S5 catalog entry: the SOAP binary-document fetch stage driven
end-to-end with a deterministic stub client — the same seam pattern as
S3 (operators/rest_fetch.py): the plumbing (per-worker client,
Resilient retries, base64-decode, broadcast format dim) is real; only
the network call is injectable.

Reference: caseguard/proclaim/soap_downloader.py:101-161 (GetDocument →
base64 filedata → bytes, MIME/extension resolution from the :23-68
maps); WSDL operations at Proclaim.wsdl:954+.
"""

from __future__ import annotations

import base64

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources import load_table
from ..sources.soap import FORMAT_DIM, soap_fetch, with_decoded_payload

_FORMATS = [f for f, _, _ in FORMAT_DIM]


def _stub_soap_client():
    """Deterministic fake of a zeep SOAP client: ``filedata`` is the
    base64 of a delimited record derived from (doc_code, format) — the
    same arithmetic the SQL oracle applies to the manifest, so fetch +
    decode + dim join are value-checked end to end."""

    def fetch(doc_code: str, doc_format: str) -> str:
        doc_id = int(doc_code.split("-")[1])
        reps = doc_id % 4 + 1
        content = f"FILEDATA/{doc_code}/{doc_format};" * reps
        return base64.b64encode(content.encode("ascii")).decode("ascii")

    return fetch


def s5_soap_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the documents table's manifest through the SOAP stage:
    doc_id → (doc_code, doc_format) manifest (the shape
    client.py:207-214's document_manifest returns), fetch via the
    per-worker stub client, unbase64 JVM-side, resolve MIME/extension
    through the broadcast format dimension."""
    fmt_arr = F.array(*[F.lit(f) for f in _FORMATS])
    manifest = load_table(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("DOC-"), F.lpad(F.col("doc_id").cast("string"), 6, "0")
        ).alias("doc_code"),  # lpad: truncation parity with the oracle
        F.element_at(fmt_arr, (F.col("doc_id") % len(_FORMATS) + 1).cast("int")).alias(
            "doc_format"
        ),
    )
    decoded = with_decoded_payload(spark, soap_fetch(manifest, _stub_soap_client))
    return decoded.select(
        "doc_code",
        "doc_format",
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        F.substring(F.decode(F.col("payload"), "utf-8"), 1, 24).alias("preview"),
        "mime_type",
        "extension",
        "fetch_status",
        "attempts",
    )


QUERIES = {"s5_soap_fetch": s5_soap_fetch}

_DIM_VALUES = ", ".join(f"('{f}', '{m}', '{e}')" for f, m, e in FORMAT_DIM)
_FMT_LIST = ", ".join(f"'{f}'" for f in _FORMATS)

ORACLES = {
    "s5_soap_fetch": f"""
        WITH m AS (
            SELECT 'DOC-' || lpad(CAST(doc_id AS VARCHAR), 6, '0') AS doc_code,
                   [{_FMT_LIST}][CAST(doc_id % {len(_FORMATS)} AS INT) + 1] AS doc_format,
                   CAST(doc_id % 4 AS INT) + 1 AS reps
            FROM documents
        ), fdim(doc_format, mime_type, extension) AS (
            VALUES {_DIM_VALUES}
        ), d AS (
            SELECT doc_code, doc_format,
                   repeat('FILEDATA/' || doc_code || '/' || doc_format || ';',
                          reps) AS content
            FROM m
        )
        SELECT d.doc_code, d.doc_format,
               CAST(length(content) AS BIGINT) AS n_bytes,
               substring(content, 1, 24) AS preview,
               coalesce(fdim.mime_type, 'application/octet-stream') AS mime_type,
               coalesce(fdim.extension, '.bin') AS extension,
               'ok' AS fetch_status,
               CAST(1 AS INT) AS attempts
        FROM d LEFT JOIN fdim USING (doc_format)
    """,
}
