"""Source/sink connectors beyond the core parquet tables (SURVEY.md §2.1).

- S1  CSV case scan: the reference's FDM CSV discovery
  (crm/discovery.py:193-232) — header CSV → canonical columns, UK date
  parsing, is_active derivation.
- S6  Partitioned object-store layout: the reference's tenant key hierarchy
  ``{tenant}/documents/{zone}/{case_ref}/…`` (storage/spaces.py:74-96)
  becomes a partitioned parquet layout ``tenant_id=… /zone=…`` — partition
  pruning replaces key-prefix listing.
- S13 Metrics export: JSON/CSV report sinks (monitoring/dashboard.py:311-382).

S3/S5 (REST/SOAP fetchers) are network clients in the reference; their
engine-side shape — a mapInPandas fetch over a key DataFrame — is the same
plumbing as operators/inference.py and operators/multimodal.py stubs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

CSV_COLUMN_MAP = {
    "Solicitor Reference": "case_ref",
    "Status": "status",
    "Category": "case_type",
    "Client": "client_name",
    "Handler": "handler_name",
    "Date Opened": "date_opened_raw",
}


def csv_case_scan(spark: SparkSession, path: str) -> DataFrame:
    """S1: read a case CSV, map to canonical columns, type the values.

    Mirrors crm/discovery.py:193-232: rename per CSV_COLUMN_MAP, parse
    UK-format dates, derive is_active = status not in the closed set."""
    raw = spark.read.csv(path, header=True)
    present = [c for c in CSV_COLUMN_MAP if c in raw.columns]
    df = raw.select(
        *[F.col(f"`{c}`").alias(CSV_COLUMN_MAP[c]) for c in present]
    )
    if "date_opened_raw" in df.columns:
        df = df.withColumn(
            "date_opened",
            F.coalesce(
                F.try_to_date(F.col("date_opened_raw"), "dd/MM/yyyy"),
                F.try_to_date(F.col("date_opened_raw"), "yyyy-MM-dd"),
            ),
        ).drop("date_opened_raw")
    if "status" in df.columns:
        df = df.withColumn(
            "is_active",
            ~F.lower(F.col("status")).isin("complete", "closed"),
        )
    return df


def object_store_options(
    endpoint_url: str,
    access_key: str,
    secret_key: str,
    *,
    region: str | None = None,
    path_style: bool = True,
) -> dict[str, str]:
    """S6 deployment config: the reference's Spaces client settings
    (storage/spaces.py:36-72 — endpoint_url, credentials, region,
    path-style addressing) expressed as the public Hadoop ``fs.s3a.*``
    keys Spark's S3A filesystem reads. Returned as a dict so the same
    map works at session-build time (``spark.hadoop.`` prefix) or at
    runtime via ``configure_object_store``."""
    opts = {
        "fs.s3a.endpoint": endpoint_url,
        "fs.s3a.access.key": access_key,
        "fs.s3a.secret.key": secret_key,
        "fs.s3a.path.style.access": str(path_style).lower(),
    }
    if region is not None:
        opts["fs.s3a.endpoint.region"] = region
    return opts


def configure_object_store(spark: SparkSession, options: dict[str, str]) -> None:
    """Apply ``object_store_options`` to a live session's Hadoop
    configuration, after which ``write_partitioned``/``read_partition``
    accept ``s3a://bucket/...`` paths verbatim (hadoop-aws jar required
    on the classpath, as in any S3-enabled Spark deployment)."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in options.items():
        hconf.set(k, v)


def write_partitioned(
    df: DataFrame, path: str, *keys: str, options: dict[str, str] | None = None
) -> None:
    """S6: write with the tenant/zone partition layout. Readers filtering
    on the partition keys prune directories (the Spark analog of the
    reference's key-prefix listing). ``options`` passes writer options
    (e.g. ``compression``) straight through; for object-store targets,
    configure the filesystem once via ``configure_object_store`` and pass
    an ``s3a://`` path."""
    writer = df.write.mode("overwrite").partitionBy(*keys)
    if options:
        writer = writer.options(**options)
    writer.parquet(path)


def read_partition(
    spark: SparkSession,
    path: str,
    options: dict[str, str] | None = None,
    **filters,
) -> DataFrame:
    """S6 read side: scan + partition-key filters (pruned at planning)."""
    reader = spark.read
    if options:
        reader = reader.options(**options)
    df = reader.parquet(path)
    for k, v in filters.items():
        df = df.filter(F.col(k) == v)
    return df


def yaml_case_list_scan(spark: SparkSession, path: str) -> DataFrame:
    """S2: read a ``case_numbers`` list from a YAML config
    (crm/discovery.py:328-372). Config files are KB-sized driver-side
    reads — the resulting DataFrame is what joins/broadcasts at scale."""
    try:
        import yaml
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError("PyYAML not available") from exc
    with open(path) as fh:
        cfg = yaml.safe_load(fh) or {}
    refs = cfg.get("case_numbers", [])
    return spark.createDataFrame(
        [(str(r),) for r in refs], schema="case_ref string"
    )


# Document format code → (MIME, extension), the SOAP downloader's mapping
# table (soap_downloader.py:52-89). Joined as a broadcast dimension.
FORMAT_TO_MIME = [
    ("ACROBAT-PDF", "application/pdf", ".pdf"),
    ("WORD-DOC", "application/msword", ".doc"),
    ("PLAIN-TXT", "text/plain", ".txt"),
    ("IMAGE-PNG", "image/png", ".png"),
    ("IMAGE-JPG", "image/jpeg", ".jpg"),
]


def read_binary_documents(spark: SparkSession, path: str) -> DataFrame:
    """S5: raw document bytes via the binaryFile source, with the
    format→MIME dimension resolved from the file extension by a broadcast
    join (the Spark analog of soap_downloader.py:101-161's per-file
    download + mapping lookup). Columns: path, length, content (binary),
    ext, format_code, mime_type."""
    raw = spark.read.format("binaryFile").load(path)
    dim = spark.createDataFrame(
        FORMAT_TO_MIME, schema="format_code string, mime_type string, ext string"
    )
    with_ext = raw.select(
        "path",
        "length",
        "content",
        F.lower(F.regexp_extract(F.col("path"), r"(\.[^./\\]+)$", 1)).alias("ext"),
    )
    return with_ext.join(F.broadcast(dim), "ext", "left").select(
        "path", "length", "content", "ext", "format_code", "mime_type"
    )


def compact_parquet(
    spark: SparkSession, src: str, dst: str, rows_per_file: int = 1_000_000
) -> int:
    """Small-files compaction (the lake-maintenance op behind S6): rewrite
    ``src`` into ``dst`` with ~rows_per_file rows per output file.

    Streaming sinks and incremental appends accumulate thousands of small
    files; scans then pay per-file open cost and lose row-group-level
    parallelism. Periodic compaction (Delta's OPTIMIZE) is the fix; this
    is the vanilla-parquet version. Returns the output file count."""
    df = spark.read.parquet(src)
    n = max(1, df.count() // rows_per_file or 1)
    df.repartition(n).write.mode("overwrite").parquet(dst)
    return n


def convert_format(
    spark: SparkSession, src: str, dst: str, src_fmt: str, dst_fmt: str
) -> int:
    """Format interchange for the lake edge (S6 breadth): read ``src`` in
    ``src_fmt``, write ``dst`` in ``dst_fmt`` — parquet/orc/json/csv, the
    formats Spark serves natively. Upstream systems deliver whatever they
    deliver; the engine normalizes to parquet at ingest and can export
    back out for consumers that want ORC or CSV. Returns the row count
    (the integrity check a conversion job logs)."""
    readers = {"parquet", "orc", "json", "csv"}
    if src_fmt not in readers or dst_fmt not in readers:
        raise ValueError(f"unsupported format: {src_fmt} -> {dst_fmt}")
    reader = spark.read.format(src_fmt)
    if src_fmt == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    df = reader.load(src)
    writer = df.write.mode("overwrite").format(dst_fmt)
    if dst_fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(dst)
    return df.count()


def read_merged_schema(spark: SparkSession, path: str) -> DataFrame:
    """Schema-on-read over evolving layouts (SURVEY §1.2's permissive raw
    zone): ``mergeSchema`` unions column sets across files written at
    different schema versions; missing columns read as NULL."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def export_metrics(df: DataFrame, path: str, fmt: str = "json") -> None:
    """S13: metrics/report export sink (single file per partition; metrics
    outputs are tiny post-aggregation so coalesce(1) is safe)."""
    writer = df.coalesce(1).write.mode("overwrite")
    if fmt == "json":
        writer.json(path)
    elif fmt == "csv":
        writer.option("header", "true").csv(path)
    else:
        raise ValueError(f"unsupported export format: {fmt}")
