"""Config-driven canonical field extraction (P2 breadth, SURVEY.md §2.2).

The reference declares its canonical case schema as DATA: each of the
4+26 fields in config/canonical_fields_corrected.json carries an
api_path, an extraction_method, and a data_type, and
smart_field_retriever.py:36-97 walks the rules to pull typed values out
of the raw per-case payload (with parser fallbacks at :332-365). The
engine's P2 operator was a fixed 5-column alias map; this module is the
config-first composition: ``apply_field_rules`` takes a rules mapping
and emits the full typed canonical frame; each rule's extraction_method
MIRRORS the corresponding F1-F5 parser expression (kept behaviorally in
sync by the shared oracle gate — a semantic change to one that misses
the other fails parity, not silently drifts).

Everything stays a single Project over the raw frame — rules compile to
column expressions at plan-build time (no UDF, no per-rule pass), so 30
rules cost exactly one codegen'd stage regardless of count, and filters
on canonical columns still push down into the scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from ..sources import load_table

# One rule per canonical field, mirroring canonical_fields_corrected.json's
# (field, api_path→source column, extraction_method, data_type[, param]).
FieldRule = dict


def _parse_date_multi(c: Column) -> Column:
    """F1 chain: UK slash, ISO, ordinal long form."""
    stripped = F.regexp_replace(c, r"(\d+)(st|nd|rd|th)", r"$1")
    return F.coalesce(
        F.try_to_date(c, "dd/MM/yyyy"),
        F.try_to_date(c, "yyyy-MM-dd"),
        F.try_to_date(stripped, "d MMMM yyyy"),
    )


def _rule_expr(rule: FieldRule) -> Column:
    src = F.col(rule["source"])
    method = rule["method"]
    dtype = rule.get("dtype", "string")
    if method == "direct":
        out = src.cast(dtype)
    elif method == "date_multi":
        # dates emit ISO strings (cross-engine hash parity, FIXTURES §D)
        out = F.date_format(_parse_date_multi(src), "yyyy-MM-dd")
    elif method == "currency":
        cleaned = F.nullif(F.trim(src), F.lit("[Empty]"))
        # try_cast: arbitrary tenant payloads carry 'N/A'/'TBC' residue —
        # the dead-letter semantic is NULL, not a job-aborting ANSI cast
        # error (the reference's parser fallbacks, retriever.py:332-365)
        out = F.round(
            F.regexp_replace(cleaned, r"[£,]", "").try_cast("double"), 2
        )
    elif method == "money_regex":
        hit = F.regexp_extract(src, r"£([0-9,]+\.?[0-9]*)", 1)
        # strip the commas the regex admits; try_cast turns a no-match ''
        # into NULL instead of an ANSI crash
        out = F.regexp_replace(hit, ",", "").try_cast("double")
    elif method == "date_regex":
        hit = F.regexp_extract(src, r"(\d{1,2}/\d{1,2}/\d{2,4})", 1)
        out = F.date_format(F.try_to_date(hit, "dd/MM/yyyy"), "yyyy-MM-dd")
    elif method == "keyword_flag":
        out = F.lower(src).contains(rule["param"])
    else:
        raise ValueError(f"unknown extraction_method: {method!r}")
    return out.alias(rule["field"])


def apply_field_rules(raw: DataFrame, rules: list[FieldRule]) -> DataFrame:
    """Compile the rules table into one typed Project over ``raw``."""
    return raw.select(*[_rule_expr(r) for r in rules])


# The engine's stand-in for canonical_fields_corrected.json: 11 fields of
# mixed types across every extraction method.
CANONICAL_RULES: list[FieldRule] = [
    {"field": "case_id", "source": "raw_key", "method": "direct", "dtype": "bigint"},
    {"field": "case_ref", "source": "raw_ref", "method": "direct"},
    {"field": "status", "source": "raw_status", "method": "direct"},
    {"field": "priority_label", "source": "raw_priority", "method": "direct"},
    {"field": "balance", "source": "raw_balance", "method": "direct", "dtype": "double"},
    {"field": "date_opened", "source": "raw_opened", "method": "date_multi"},
    {"field": "claim_amount", "source": "raw_amount", "method": "currency"},
    {"field": "settlement_amount", "source": "raw_note", "method": "money_regex"},
    {"field": "hearing_date", "source": "raw_hearing", "method": "date_regex"},
    {"field": "is_urgent", "source": "raw_priority", "method": "keyword_flag",
     "param": "urgent"},
    {"field": "mentions_court", "source": "raw_hearing", "method": "keyword_flag",
     "param": "court"},
]


def raw_case_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized raw API payload frame (the shape client.py's per-case
    GETs produce): string-typed fields with the reference's quirks — UK
    dates, '£'-prefixed amounts with an '[Empty]' sentinel, free-text
    notes carrying money/dates."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    dec = F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)").cast("string")
    return orders.select(
        F.col("o_orderkey").alias("raw_key"),
        F.format_string("NBC-%06d", F.col("o_orderkey")).alias("raw_ref"),
        F.col("o_orderstatus").alias("raw_status"),
        F.col("o_orderpriority").alias("raw_priority"),
        F.round(F.col("o_totalprice"), 2).alias("raw_balance"),
        F.date_format("o_orderdate", "dd/MM/yyyy").alias("raw_opened"),
        F.when((F.col("o_orderkey") % 10) == 0, F.lit("[Empty]"))
        .otherwise(F.concat(F.lit("£"), dec))
        .alias("raw_amount"),
        F.concat(
            F.lit("Settlement agreed at £"), dec,
            F.lit(" for order "), F.col("o_orderkey").cast("string"),
        ).alias("raw_note"),
        F.concat(
            F.lit("Hearing listed on "),
            F.date_format("o_orderdate", "dd/MM/yyyy"),
            F.lit(" at court"),
        ).alias("raw_hearing"),
    )


def p2_canonical_config(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2, config-driven: raw payload frame → CANONICAL_RULES → typed
    canonical case frame. Adding a field to the rules list (the JSON
    analog) is the whole change — no operator edit."""
    return apply_field_rules(raw_case_frame(spark, sf_dir), CANONICAL_RULES)


QUERIES = {"p2_canonical_config": p2_canonical_config}

ORACLES = {
    "p2_canonical_config": """
        WITH raw AS (
            SELECT o_orderkey AS raw_key,
                   'NBC-' || lpad(CAST(o_orderkey AS VARCHAR), 6, '0') AS raw_ref,
                   o_orderstatus AS raw_status,
                   o_orderpriority AS raw_priority,
                   round(o_totalprice, 2) AS raw_balance,
                   strftime(o_orderdate, '%d/%m/%Y') AS raw_opened,
                   CASE WHEN o_orderkey % 10 = 0 THEN '[Empty]'
                        ELSE '£' || CAST(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS VARCHAR)
                   END AS raw_amount,
                   'Settlement agreed at £'
                     || CAST(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS VARCHAR)
                     || ' for order ' || CAST(o_orderkey AS VARCHAR) AS raw_note,
                   'Hearing listed on ' || strftime(o_orderdate, '%d/%m/%Y')
                     || ' at court' AS raw_hearing
            FROM orders WHERE o_orderkey < 500
        )
        SELECT raw_key AS case_id,
               raw_ref AS case_ref,
               raw_status AS status,
               raw_priority AS priority_label,
               CAST(raw_balance AS DOUBLE) AS balance,
               strftime(strptime(raw_opened, '%d/%m/%Y'), '%Y-%m-%d') AS date_opened,
               round(CAST(regexp_replace(nullif(trim(raw_amount), '[Empty]'),
                                         '[£,]', '', 'g') AS DOUBLE), 2) AS claim_amount,
               CAST(regexp_extract(raw_note, '£([0-9,]+\\.?[0-9]*)', 1) AS DOUBLE)
                 AS settlement_amount,
               strftime(strptime(regexp_extract(raw_hearing,
                                 '(\\d{1,2}/\\d{1,2}/\\d{2,4})', 1),
                        '%d/%m/%Y'), '%Y-%m-%d') AS hearing_date,
               contains(lower(raw_priority), 'urgent') AS is_urgent,
               contains(lower(raw_hearing), 'court') AS mentions_court
        FROM raw
    """,
}
