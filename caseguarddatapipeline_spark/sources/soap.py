"""SOAP binary document fetch (S5, SURVEY.md §2.1): a mapInPandas fetch
stage over a document-manifest DataFrame plus a broadcast format
dimension for MIME/extension resolution.

The reference fetches each document over SOAP — ``GetDocument(token,
documentCode, format)`` returning base64 ``filedata`` decoded to bytes
and written to a temp file, with MIME type and extension resolved from
per-format maps (caseguard/proclaim/soap_downloader.py:101-161, maps at
:23-68; WSDL operations Proclaim.wsdl:954+). The Spark-first shape
mirrors the S3 REST stage (sources/rest.py): the manifest frame drives
the work, each python worker holds ONE SOAP client built lazily from an
injectable picklable factory (zeep in production, a deterministic stub
in tests — no network in this environment), and every call runs through
``Resilient`` so a flaky endpoint degrades to dead-letter rows instead
of failed tasks. The base64 decode and the format→MIME/extension lookup
happen JVM-side AFTER the fetch stage — ``unbase64`` is codegen'd and
the format dimension is a broadcast join, so the python worker only
moves the payload string once.

At 100 TB-scale backfills the stage is bandwidth-bound: parallelism =
manifest partitioning (repartition upstream to the endpoint's
concurrency budget), pacing composes via the client factory, and the
decoded binary lands in a parquet binary column partitioned by tenant —
the object-store layout S6 models (caseguard/storage/spaces.py:74-96).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# Format dimension: (doc_format, mime_type, extension) — the engine's
# relational form of soap_downloader.py:23-68's FORMAT_TO_MIME /
# EXTENSION_MAP pair (standard IANA media types).
FORMAT_DIM: list[tuple[str, str, str]] = [
    ("ACROBAT-PDF", "application/pdf", ".pdf"),
    ("WORD-DOC", "application/msword", ".doc"),
    ("WORD-DOCX",
     "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
     ".docx"),
    ("TEXT", "text/plain", ".txt"),
    ("HTML", "text/html", ".html"),
    ("IMAGE-JPEG", "image/jpeg", ".jpg"),
    ("IMAGE-PNG", "image/png", ".png"),
    ("EMAIL-MSG", "application/vnd.ms-outlook", ".msg"),
]

SOAP_FETCH_SCHEMA = (
    "doc_code string, doc_format string, filedata_b64 string, "
    "fetch_status string, attempts int"
)


def format_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        FORMAT_DIM, "doc_format string, mime_type string, extension string"
    )


def soap_fetch(
    manifest: DataFrame,
    soap_factory: Callable[[], Callable[[str, str], str]],
    *,
    code_col: str = "doc_code",
    format_col: str = "doc_format",
    max_attempts: int = 4,
    base_delay: float = 1.0,
    failure_threshold: int = 5,
    sleep: Callable[[float], None] | None = None,
) -> DataFrame:
    """Fetch one base64 ``filedata`` payload per manifest row.

    ``soap_factory`` is a picklable zero-arg callable returning the
    actual ``fetch(doc_code, doc_format) -> base64-str`` client — in
    production a closure over a zeep ``Client`` bound to the tenant's
    WSDL/endpoint (soap_downloader.py:72-97), built once per python
    worker. Failures after retries yield ``fetch_status='failed'`` rows
    with NULL filedata (dead-letter pattern, T4) and the real attempt
    count from ``Resilient``."""
    from ..operators.resilience import Resilient

    def stage(batches: Iterator) -> Iterator:
        import pandas as pd

        fetch = soap_factory()  # one SOAP client per python worker
        kwargs = {"sleep": sleep} if sleep is not None else {}
        wrapped = Resilient(
            fetch,
            max_attempts=max_attempts,
            base_delay=base_delay,
            failure_threshold=failure_threshold,
            **kwargs,
        )
        for pdf in batches:
            out = {
                "doc_code": [], "doc_format": [], "filedata_b64": [],
                "fetch_status": [], "attempts": [],
            }
            for code, fmt in zip(pdf[code_col], pdf[format_col]):
                try:
                    payload = wrapped(code, fmt)
                    status = "ok"
                except Exception:  # noqa: BLE001 — endpoint errors are opaque
                    payload, status = None, "failed"
                out["doc_code"].append(code)
                out["doc_format"].append(fmt)
                out["filedata_b64"].append(payload)
                out["fetch_status"].append(status)
                out["attempts"].append(wrapped.last_attempts)
            yield pd.DataFrame(out)

    return manifest.select(code_col, format_col).mapInPandas(
        stage, SOAP_FETCH_SCHEMA
    )


def with_decoded_payload(spark: SparkSession, fetched: DataFrame) -> DataFrame:
    """Binary-safe decode + format resolution, all JVM-side: unbase64 the
    filedata into a ``binary`` payload column (soap_downloader.py:135's
    decode step) and resolve MIME/extension through the broadcast format
    dimension (left join: unknown formats keep NULL mime — the
    '.bin'/octet-stream fallback is the caller's when/otherwise)."""
    return (
        fetched.withColumn("payload", F.unbase64(F.col("filedata_b64")))
        .join(F.broadcast(format_dim(spark)), "doc_format", "left")
        .select(
            "doc_code",
            "doc_format",
            "payload",
            F.length("payload").alias("n_bytes"),
            F.coalesce("mime_type", F.lit("application/octet-stream")).alias(
                "mime_type"
            ),
            F.coalesce("extension", F.lit(".bin")).alias("extension"),
            "fetch_status",
            "attempts",
        )
    )
