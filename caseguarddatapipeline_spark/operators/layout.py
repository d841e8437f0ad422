"""Z-order (Morton) clustered data layout (S6 extension, SURVEY.md §2.1).

The reference's object-store layout clusters one dimension at a time — the
tenant/zone/case key hierarchy (storage/spaces.py:74-96) prunes by prefix
on exactly that path. A 100 TB lake is queried along MORE than one
dimension (tenant AND time, customer AND date), and a single sort order
leaves every other predicate a full scan. Z-ordering interleaves the bits
of two (or more) normalized keys so that a CONTIGUOUS range of the derived
z-value covers a ~√-sized range of EACH dimension — rows close in z are
close in every interleaved dimension, so parquet row-group min/max stats
become selective for all of them at once (the same trick Delta's OPTIMIZE
ZORDER BY applies).

Everything is bit arithmetic on JVM-side integer expressions — no UDF:

- ``zvalue_col`` builds the interleave expression (shift/and/or chain,
  whole-stage-codegen friendly).
- ``s6_zorder_layout`` is the catalog entry: bucket orders by z(custkey
  mod 256, order-day mod 256) into 256 z-contiguous buckets and report
  each bucket's span in BOTH dimensions — the quantitative form of the
  locality claim, with an exact DuckDB oracle (same bit ops).
- ``zorder_write`` is the deployable write path: range-partition by
  z-value, sort within partitions, write parquet — after which both
  dimensions' row-group stats prune (tests verify via pyarrow metadata
  against a single-dimension-sorted baseline).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from ..sources import load_table

BITS = 8  # per-dimension resolution of the interleave (16-bit z-value)


def zvalue_col(x: Column, y: Column, bits: int = BITS) -> Column:
    """Morton code of two non-negative ints already reduced to ``bits``
    bits each: x occupies even bit positions, y odd."""
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return z


def _zvalue_sql(x: str, y: str, bits: int = BITS) -> str:
    """The identical interleave as DuckDB SQL (same <</>>/& semantics)."""
    terms = []
    for b in range(bits):
        terms.append(f"((({x} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({y} >> {b}) & 1) << {2 * b + 1})")
    return " | ".join(terms)


def s6_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-z-bucket locality report over orders: 256 z-contiguous buckets
    of z(custkey mod 256, days-since-epoch mod 256), each with its row
    count and min/max in BOTH dimensions. A z-contiguous bucket's spans
    are ~√|z-range| in each dimension (vs the full domain for any
    single-sort layout's secondary dimension) — the property that makes
    row-group stats prune two-dimensionally."""
    orders = load_table(spark, sf_dir, "orders")
    x = (F.col("o_custkey") % 256).cast("long")
    y = (F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date")) % 256).cast(
        "long"
    )
    z = zvalue_col(x, y)
    return (
        orders.select(x.alias("x"), y.alias("y"), z.alias("z"))
        .groupBy(F.shiftright(F.col("z"), 8).alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    )


def zorder_write(
    df: DataFrame, path: str, x: Column, y: Column, n_files: int, *, bits: int = BITS
) -> None:
    """Write ``df`` z-order-clustered on (x, y): range-partition by the
    z-value (contiguous z-slices per output file, boundaries from data
    quantiles), sort within partitions, drop the helper column. The x/y
    expressions must already be reduced to ``bits`` non-negative bits."""
    (
        df.withColumn("_z", zvalue_col(x, y, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def s14_scan_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source-file lineage over the document scan: every row is tagged
    with the physical file it came from via the ``_metadata`` hidden
    column (no extra IO — the scan already knows its file), then rolled up
    to file-level counts and key spans. Training-data provenance is a
    ship-blocking requirement for a corpus build (which crawl snapshot /
    dump produced these rows?); at 100 TB the same expression tags
    millions of files and survives into the curated output as a lineage
    column. The oracle pins the expected layout (one file per table in
    the driver fixture), verifying the _metadata plumbing end-to-end."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.select(
            F.col("_metadata.file_name").alias("file_name"), "doc_id", "n_chars"
        )
        .groupBy("file_name")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


QUERIES = {
    "s6_zorder_layout": s6_zorder_layout,
    "s14_scan_provenance": s14_scan_provenance,
}

ORACLES = {
    # the fixture layout is one file per table, so the expected lineage
    # is a constant — what's under test is Spark's _metadata tagging
    "s14_scan_provenance": """
        SELECT 'documents.parquet' AS file_name,
               count(*) AS n_docs,
               min(doc_id) AS min_doc_id,
               max(doc_id) AS max_doc_id,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents
    """,
    "s6_zorder_layout": f"""
        WITH keyed AS (
            SELECT o_custkey % 256 AS x,
                   date_diff('day', DATE '1992-01-01', o_orderdate) % 256 AS y
            FROM orders
        ), zed AS (
            SELECT x, y, {_zvalue_sql('x', 'y')} AS z FROM keyed
        )
        SELECT z >> 8 AS z_bucket,
               count(*) AS n_rows,
               min(x) AS x_min, max(x) AS x_max,
               min(y) AS y_min, max(y) AS y_max
        FROM zed GROUP BY z_bucket
    """,
}
