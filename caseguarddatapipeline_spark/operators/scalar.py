"""Scalar/typing layer: dates, currency, regex extraction, JSON, arrays.

Covers SURVEY.md §2.6 (F1-F20) and §2.7 (N1-N6). Every function here is pure
column expressions — whole-stage-codegen-friendly, no Python in the hot path.
The reference does all of this row-at-a-time in Python
(smart_field_retriever.py:332-365 type coercion, technical-details.md:903-943
currency/ordinal-date parsing, ai/enricher.py:175-246 JSON validation).

Inputs that the driver tables don't carry natively (UK date strings, currency
strings with '[Empty]' sentinels) are synthesized deterministically inside the
query from real columns, so the DuckDB oracles stay exact (FIXTURES.md §B).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources import load_table


def _ordinal_suffix(day_col):
    """st/nd/rd/th suffix for a day-of-month column (1-31)."""
    return (
        F.when(day_col.isin(1, 21, 31), F.lit("st"))
        .when(day_col.isin(2, 22), F.lit("nd"))
        .when(day_col.isin(3, 23), F.lit("rd"))
        .otherwise(F.lit("th"))
    )


def f1_multiformat_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-format date parsing (technical-details.md:920-943,
    smart_field_retriever.py:345-351, crm/discovery.py:234-253).

    Synthesizes three string renderings of o_orderdate — UK slash
    (dd/MM/yyyy), ISO, and ordinal long form ("4th October 2024") — then
    parses each back via the engine's coalesce-of-formats chain, stripping
    ordinal suffixes with a regex first. parsed_ok proves round-tripping.
    """
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    d = F.col("o_orderdate")
    day = F.dayofmonth(d)
    uk = F.date_format(d, "dd/MM/yyyy")
    iso = F.date_format(d, "yyyy-MM-dd")
    ordinal = F.concat(
        day.cast("string"), _ordinal_suffix(day), F.lit(" "),
        F.date_format(d, "MMMM yyyy"),
    )
    with_strings = orders.select(
        "o_orderkey", uk.alias("uk_str"), iso.alias("iso_str"),
        ordinal.alias("ordinal_str"),
        F.date_format(d, "yyyy-MM-dd").alias("expected"),
    )

    def parse_any(c):
        # try_to_date: each format attempt returns NULL on mismatch so the
        # coalesce chain falls through (plain to_date raises under ANSI).
        stripped = F.regexp_replace(c, r"(\d+)(st|nd|rd|th)", r"$1")
        return F.coalesce(
            F.try_to_date(c, "dd/MM/yyyy"),
            F.try_to_date(c, "yyyy-MM-dd"),
            F.try_to_date(stripped, "d MMMM yyyy"),
        )

    return with_strings.select(
        "o_orderkey", "uk_str", "ordinal_str",
        F.date_format(parse_any(F.col("uk_str")), "yyyy-MM-dd").alias("parsed_uk"),
        F.date_format(parse_any(F.col("iso_str")), "yyyy-MM-dd").alias("parsed_iso"),
        F.date_format(parse_any(F.col("ordinal_str")), "yyyy-MM-dd").alias(
            "parsed_ordinal"
        ),
        (
            (F.date_format(parse_any(F.col("uk_str")), "yyyy-MM-dd") == F.col("expected"))
            & (F.date_format(parse_any(F.col("ordinal_str")), "yyyy-MM-dd")
               == F.col("expected"))
        ).alias("parsed_ok"),
    )


def f2_currency_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Currency parsing with '[Empty]' sentinel (technical-details.md:903-918,
    F18 null normalization). Synthesizes '£<decimal>' strings (every 10th row
    the '[Empty]' sentinel), then nullif → strip symbols → cast decimal."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    amount_str = F.when(
        (F.col("o_orderkey") % 10) == 0, F.lit("[Empty]")
    ).otherwise(
        F.concat(F.lit("£"), F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)").cast("string"))
    )
    cleaned = F.nullif(F.trim(amount_str), F.lit("[Empty]"))
    # Final amount emitted as double (not decimal): pandas/Arrow decimal
    # representations differ across engines and break value hashing.
    return orders.select(
        "o_orderkey",
        amount_str.alias("amount_str"),
        F.round(
            F.regexp_replace(cleaned, r"[£,]", "").cast("double"), 2
        ).alias("amount"),
    )


def f3_money_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money-amount regex extraction from free text
    (smart_field_retriever.py:377-384): first £-amount in a sentence."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    sentence = F.concat(
        F.lit("Settlement agreed at £"),
        F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)").cast("string"),
        F.lit(" for order "), F.col("o_orderkey").cast("string"),
    )
    return orders.select(
        "o_orderkey",
        sentence.alias("sentence"),
        # comma strip + try_cast: the regex admits thousands separators
        # and a no-match extracts '' — both must degrade to NULL, not an
        # ANSI cast error (f2_currency_parse's convention)
        F.regexp_replace(
            F.regexp_extract(sentence, r"£([0-9,]+\.?[0-9]*)", 1), ",", ""
        ).try_cast("double").alias("extracted_amount"),
    )


def f4_date_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date regex extraction from text (smart_field_retriever.py:385-391)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    sentence = F.concat(
        F.lit("Hearing listed on "),
        F.date_format("o_orderdate", "dd/MM/yyyy"),
        F.lit(" at court"),
    )
    extracted = F.regexp_extract(sentence, r"(\d{1,2}/\d{1,2}/\d{2,4})", 1)
    return orders.select(
        "o_orderkey",
        sentence.alias("sentence"),
        # try_to_date: text without a date substring extracts '' and must
        # yield NULL (same reason f1's parser chain uses try_to_date)
        F.date_format(F.try_to_date(extracted, "dd/MM/yyyy"), "yyyy-MM-dd").alias(
            "extracted_date"
        ),
    )


def f5_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Configured-keyword search over event/document text
    (smart_field_retriever.py:221-256, terms from
    canonical_fields_corrected.json). Lowercased containment over the
    document text; emits per-term hit flags + a hit count."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.lower(F.col("text"))
    terms = ["merge", "window", "stream"]
    flags = [text.contains(t).alias(f"has_{t}") for t in terms]
    hits = sum(
        (text.contains(t).cast("int") for t in terms), F.lit(0)
    ).alias("n_terms_hit")
    return docs.select("doc_id", *flags, hits).filter(F.col("n_terms_hit") > 0)


def f8_surrogate_serialno(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-surrogate serialno (crm/discovery.py:221,160-173). The reference
    uses Python hash()%100000; cross-engine hash parity is impossible
    (FIXTURES.md §D) so the surrogate is a deterministic affine map — same
    distributional role, exactly reproducible in any engine."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        (((F.col("o_orderkey") % 100000) * 7919 + 17) % 100000).alias("serialno"),
    )


def f9_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content hash for vector dedup keys (database/models.py:81):
    sha256 over document text — byte-identical across engines."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id", F.sha2(F.col("text"), 256).alias("content_hash")
    )


def f11_json_decode_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-JSON decode + validation (ai/enricher.py:175-246): parse the
    events.props JSON, pull a typed field, clamp a derived score to [0,1]
    with least/greatest, fall back when the field is missing."""
    # try_cast: a malformed LLM payload like {"k": "high"} must degrade to
    # the fallback, not abort the query with an ANSI cast error.
    # One spark.sql parse (round-13 serving optimization); the D-suffixed
    # literals keep the arithmetic in DOUBLE exactly like the F.lit forms
    # (a bare 100.0 would parse as DECIMAL and change the division).
    from ..sources.tables import scoped_views

    v = scoped_views(spark, sf_dir)
    return spark.sql(f"""
        SELECT event_id,
               coalesce(k, -1) AS k_value,
               round(coalesce(least(greatest(CAST(k AS DOUBLE) / 100.0D,
                                             0.0D), 1.0D), 0.0D), 6)
                   AS clamped_score
        FROM (SELECT event_id,
                     try_cast(get_json_object(props, '$.k') AS INT) AS k
              FROM {v['events']})
    """)


def f12_weighted_priority_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted priority scoring (ai/enricher.py:248-311): additive weighted
    formula over normalized components, clamped to [0,1]."""
    orders = load_table(spark, sf_dir, "orders")
    settlement = F.least(F.col("o_totalprice") / F.lit(300000.0), F.lit(1.0))
    urgency = F.when(F.col("o_orderpriority").startswith("1"), 1.0).when(
        F.col("o_orderpriority").startswith("2"), 0.75
    ).when(F.col("o_orderpriority").startswith("3"), 0.5).otherwise(0.25)
    status_w = F.when(F.col("o_orderstatus") == "O", 0.8).when(
        F.col("o_orderstatus") == "P", 0.5
    ).otherwise(0.2)
    score = F.least(
        F.greatest(
            F.lit(0.4) * settlement + F.lit(0.3) * urgency + F.lit(0.3) * status_w,
            F.lit(0.0),
        ),
        F.lit(1.0),
    )
    return orders.select("o_orderkey", F.round(score, 6).alias("priority_score"))


def f14_interval_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch/interval arithmetic (sync_daily_enhanced.py:167-172,
    dashboard.py:706): hours since a fixed instant + a 24h-window flag."""
    events = load_table(spark, sf_dir, "events")
    as_of = F.to_timestamp_ntz(F.lit("2024-01-02 00:00:00"))
    # unix_micros, not unix_timestamp: the latter truncates to whole seconds
    # and diverges from DuckDB's fractional epoch arithmetic.
    hours = (
        F.unix_micros(as_of.cast("timestamp"))
        - F.unix_micros(F.col("ts").cast("timestamp"))
    ) / F.lit(3.6e9)
    return events.select(
        "event_id",
        F.round(hours, 4).alias("hours_since"),
        (hours <= 24.0).alias("within_24h"),
    )


def f17_filename_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filename/extension functions (soap_downloader.py:138-149,
    format_config.py:96-98): synthesize a filename per document, split the
    extension, lowercase it, size class from n_chars."""
    docs = load_table(spark, sf_dir, "documents")
    ext = F.when((F.col("doc_id") % 3) == 0, "PDF").when(
        (F.col("doc_id") % 3) == 1, "Docx"
    ).otherwise("txt")
    filename = F.concat(
        F.lit("case_"), F.col("doc_id").cast("string"), F.lit("."), ext
    )
    return docs.select(
        "doc_id",
        filename.alias("filename"),
        F.lower(F.regexp_extract(filename, r"\.([^.]+)$", 1)).alias("extension"),
        F.round(F.col("n_chars") / F.lit(1048576.0), 9).alias("size_mb"),
    )


# --------------------------------------------------------------------------
# N — array / map / nested operators (embedder.py:255-314, N1-N6)
# --------------------------------------------------------------------------


def n1_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of a per-entity list (embedder.py:255-282 explodes
    key_issues with issue_index): first 5 tokens of each small document with
    their position."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    tokens = F.slice(F.split(F.col("text"), " "), 1, 5)
    return docs.select(
        "doc_id", F.posexplode(tokens).alias("token_index", "token")
    )


def n3_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-length features (embedder.py:194-219): token count, distinct
    token count, and a first-5-token preview per document."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(tokens).alias("n_tokens"),
        F.size(F.array_distinct(tokens)).alias("n_distinct_tokens"),
        F.array_join(F.slice(tokens, 1, 5), " ").alias("preview"),
    )


def n5_split_trim_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comma-split string→array canonical conversion
    (smart_field_retriever.py:354-360): split, trim each element, rejoin
    canonically."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    csv_col = F.concat_ws(" , ", "o_orderstatus", "o_orderpriority",
                          F.col("o_custkey").cast("string"))
    arr = F.transform(F.split(csv_col, ","), lambda x: F.trim(x))
    return orders.select(
        "o_orderkey",
        csv_col.alias("raw_csv"),
        F.array_join(arr, "|").alias("canonical"),
        F.size(arr).alias("n_parts"),
    )


QUERIES = {
    "f1_multiformat_dates": f1_multiformat_dates,
    "f2_currency_parse": f2_currency_parse,
    "f3_money_extraction": f3_money_extraction,
    "f4_date_extraction": f4_date_extraction,
    "f5_keyword_search": f5_keyword_search,
    "f8_surrogate_serialno": f8_surrogate_serialno,
    "f9_content_hash": f9_content_hash,
    "f11_json_decode_validate": f11_json_decode_validate,
    "f12_weighted_priority_score": f12_weighted_priority_score,
    "f14_interval_math": f14_interval_math,
    "f17_filename_functions": f17_filename_functions,
    "n1_explode_tokens": n1_explode_tokens,
    "n3_array_stats": n3_array_stats,
    "n5_split_trim_array": n5_split_trim_array,
}

ORACLES = {
    "f1_multiformat_dates": """
        WITH base AS (
            SELECT o_orderkey,
                   strftime(o_orderdate, '%d/%m/%Y') AS uk_str,
                   strftime(o_orderdate, '%Y-%m-%d') AS iso_str,
                   CAST(date_part('day', o_orderdate) AS VARCHAR)
                     || CASE WHEN date_part('day', o_orderdate) IN (1,21,31) THEN 'st'
                             WHEN date_part('day', o_orderdate) IN (2,22) THEN 'nd'
                             WHEN date_part('day', o_orderdate) IN (3,23) THEN 'rd'
                             ELSE 'th' END
                     || ' ' || strftime(o_orderdate, '%B %Y') AS ordinal_str,
                   strftime(o_orderdate, '%Y-%m-%d') AS expected
            FROM orders WHERE o_orderkey < 500
        ), parsed AS (
            SELECT o_orderkey, uk_str, ordinal_str, expected,
                   strftime(strptime(uk_str, '%d/%m/%Y'), '%Y-%m-%d') AS parsed_uk,
                   iso_str AS parsed_iso,
                   strftime(strptime(regexp_replace(ordinal_str, '(\\d+)(st|nd|rd|th)', '\\1'),
                                     '%-d %B %Y'), '%Y-%m-%d') AS parsed_ordinal
            FROM base
        )
        SELECT o_orderkey, uk_str, ordinal_str, parsed_uk, parsed_iso, parsed_ordinal,
               (parsed_uk = expected AND parsed_ordinal = expected) AS parsed_ok
        FROM parsed
    """,
    "f2_currency_parse": """
        WITH s AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 10 = 0 THEN '[Empty]'
                        ELSE '£' || CAST(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS VARCHAR)
                   END AS amount_str
            FROM orders WHERE o_orderkey < 500
        )
        SELECT o_orderkey, amount_str,
               round(CAST(regexp_replace(nullif(trim(amount_str), '[Empty]'), '[£,]', '', 'g')
                    AS DOUBLE), 2) AS amount
        FROM s
    """,
    "f3_money_extraction": """
        WITH s AS (
            SELECT o_orderkey,
                   'Settlement agreed at £'
                     || CAST(CAST(round(o_totalprice,2) AS DECIMAL(18,2)) AS VARCHAR)
                     || ' for order ' || CAST(o_orderkey AS VARCHAR) AS sentence
            FROM orders WHERE o_orderkey < 500
        )
        SELECT o_orderkey, sentence,
               CAST(regexp_extract(sentence, '£([0-9,]+\\.?[0-9]*)', 1) AS DOUBLE)
                 AS extracted_amount
        FROM s
    """,
    "f4_date_extraction": """
        WITH s AS (
            SELECT o_orderkey,
                   'Hearing listed on ' || strftime(o_orderdate, '%d/%m/%Y')
                     || ' at court' AS sentence
            FROM orders WHERE o_orderkey < 500
        )
        SELECT o_orderkey, sentence,
               strftime(strptime(regexp_extract(sentence, '(\\d{1,2}/\\d{1,2}/\\d{2,4})', 1),
                                 '%d/%m/%Y'), '%Y-%m-%d') AS extracted_date
        FROM s
    """,
    "f5_keyword_search": """
        SELECT * FROM (
            SELECT doc_id,
                   contains(lower(text), 'merge') AS has_merge,
                   contains(lower(text), 'window') AS has_window,
                   contains(lower(text), 'stream') AS has_stream,
                   (CAST(contains(lower(text), 'merge') AS INT)
                    + CAST(contains(lower(text), 'window') AS INT)
                    + CAST(contains(lower(text), 'stream') AS INT)) AS n_terms_hit
            FROM documents
        ) WHERE n_terms_hit > 0
    """,
    "f8_surrogate_serialno": """
        SELECT o_orderkey, ((o_orderkey % 100000) * 7919 + 17) % 100000 AS serialno
        FROM orders
    """,
    "f9_content_hash": """
        SELECT doc_id, sha256(text) AS content_hash FROM documents WHERE doc_id < 100
    """,
    "f11_json_decode_validate": """
        WITH j AS (
            SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
            FROM events
        )
        SELECT event_id,
               coalesce(k, -1) AS k_value,
               round(coalesce(least(greatest(CAST(k AS DOUBLE) / 100.0, 0.0), 1.0), 0.0), 6)
                 AS clamped_score
        FROM j
    """,
    "f12_weighted_priority_score": """
        SELECT o_orderkey,
               round(least(greatest(
                 0.4 * least(o_totalprice / 300000.0, 1.0)
                 + 0.3 * (CASE WHEN o_orderpriority LIKE '1%' THEN 1.0
                               WHEN o_orderpriority LIKE '2%' THEN 0.75
                               WHEN o_orderpriority LIKE '3%' THEN 0.5
                               ELSE 0.25 END)
                 + 0.3 * (CASE WHEN o_orderstatus = 'O' THEN 0.8
                               WHEN o_orderstatus = 'P' THEN 0.5
                               ELSE 0.2 END), 0.0), 1.0), 6) AS priority_score
        FROM orders
    """,
    "f14_interval_math": """
        SELECT event_id,
               round((epoch_us(TIMESTAMP '2024-01-02 00:00:00') - epoch_us(CAST(ts AS TIMESTAMP))) / 3.6e9, 4)
                 AS hours_since,
               ((epoch_us(TIMESTAMP '2024-01-02 00:00:00') - epoch_us(CAST(ts AS TIMESTAMP))) / 3.6e9 <= 24.0)
                 AS within_24h
        FROM events
    """,
    "f17_filename_functions": """
        WITH s AS (
            SELECT doc_id, n_chars,
                   'case_' || CAST(doc_id AS VARCHAR) || '.' ||
                   (CASE WHEN doc_id % 3 = 0 THEN 'PDF'
                         WHEN doc_id % 3 = 1 THEN 'Docx'
                         ELSE 'txt' END) AS filename
            FROM documents
        )
        SELECT doc_id, filename,
               lower(regexp_extract(filename, '\\.([^.]+)$', 1)) AS extension,
               round(n_chars / 1048576.0, 9) AS size_mb
        FROM s
    """,
    "n1_explode_tokens": """
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ')[1:5] AS tokens
            FROM documents WHERE doc_id < 20
        )
        SELECT doc_id, CAST(g.i - 1 AS INT) AS token_index, tokens[g.i] AS token
        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tokens))) AS i) g
    """,
    "n3_array_stats": """
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents)
        SELECT doc_id,
               CAST(len(tokens) AS INT) AS n_tokens,
               CAST(len(list_distinct(tokens)) AS INT) AS n_distinct_tokens,
               array_to_string(tokens[1:5], ' ') AS preview
        FROM toks
    """,
    "n5_split_trim_array": """
        WITH s AS (
            SELECT o_orderkey,
                   o_orderstatus || ' , ' || o_orderpriority || ' , '
                     || CAST(o_custkey AS VARCHAR) AS raw_csv
            FROM orders WHERE o_orderkey < 500
        ), arr AS (
            SELECT o_orderkey, raw_csv,
                   list_transform(string_split(raw_csv, ','), x -> trim(x)) AS parts
            FROM s
        )
        SELECT o_orderkey, raw_csv,
               array_to_string(parts, '|') AS canonical,
               CAST(len(parts) AS INT) AS n_parts
        FROM arr
    """,
}
