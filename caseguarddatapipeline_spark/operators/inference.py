"""Batch-inference operators (U1-U5, SURVEY.md §2.8): LLM enrichment,
embedding generation, document text extraction — as Arrow-batched pandas
operators with deterministic stub models.

The reference calls OpenAI per case in a Python loop (ai/enricher.py:88-173
chat completion per case; caseguard/vectorization/embedder.py:138-163 one
embedding call per text) — the single biggest perf defect in the reference
(SURVEY.md §4). Spark-first, external inference is a ``mapInPandas`` /
``pandas_udf`` stage: Arrow batches amortize transfer, partition count
bounds concurrency (the reference's max_concurrent=25 becomes
``repartition(25)``), and a client-side token bucket inside the UDF matches
the reference's rate limiting (worker.py:283-305).

The default models are DETERMINISTIC stubs (the tested path, per SURVEY.md
§7 risk 6): a rule-based insight extractor and a hash-based embedder. The
``model_fn`` seam is where a real client drops in; everything around it
(batching, schema, rate limiting) is production code.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources import load_table

INSIGHT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("summary", StringType()),
        StructField("key_issues", ArrayType(StringType())),
        StructField("settlement_likelihood", DoubleType()),
        StructField("confidence", DoubleType()),
    ]
)

EMBED_DIM = 64


def _insight_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic rule-based AIInsight extractor (stands in for the
    gpt-4o-mini JSON-mode call at ai/enricher.py:138-173; output shape =
    database/models.py:62-71 with the same [0,1] clamping as
    enricher.py:175-246)."""
    for pdf in batches:
        toks = pdf["text"].str.split(" ")
        summaries = toks.map(lambda t: " ".join(t[:8]))
        key_issues = toks.map(
            lambda t: sorted(pd.Series(t).value_counts().head(3).index.tolist())
        )
        likelihood = ((pdf["n_chars"] % 100) / 100.0).clip(0.0, 1.0)
        confidence = (toks.map(len).clip(upper=200) / 200.0).clip(0.0, 1.0)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "summary": summaries,
                "key_issues": key_issues,
                "settlement_likelihood": likelihood.astype("float64"),
                "confidence": confidence.astype("float64"),
            }
        )


def u1_insight_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-enrichment operator over documents (rows-only check: the stub is
    Python-side by design; tests pin exact outputs)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    return docs.mapInPandas(_insight_batch, schema=INSIGHT_SCHEMA)


def hash_embed(texts: pd.Series, dim: int = EMBED_DIM) -> pd.Series:
    """Deterministic hash-based embedder: token → bucket via a polynomial
    rolling code, L2-normalized counts. Stands in for
    text-embedding-3-large (embedder.py:138-163)."""

    def one(text: str) -> list[float]:
        v = np.zeros(dim, dtype=np.float64)
        for tok in text.split(" "):
            code = 0
            for ch in tok:
                code = (code * 131 + ord(ch)) % 1_000_000_007
            v[code % dim] += 1.0
        n = math.sqrt(float((v * v).sum()))
        return (v / n if n > 0 else v).astype(np.float32).tolist()

    return texts.map(one)


def u2_hash_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-generation operator: pandas_udf (Arrow-batched) text →
    array<float>[64]. Emits doc_id + a rounded norm/checksum so the
    rows-only check still pins real values."""
    docs = load_table(spark, sf_dir, "documents")

    @F.pandas_udf(ArrayType(FloatType()))
    def embed_udf(texts: pd.Series) -> pd.Series:
        return hash_embed(texts)

    emb = F.col("embedding")
    dbl = F.transform(emb, lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(
            F.zip_with(dbl, dbl, lambda x, y: x * y),
            F.lit(0.0),
            lambda a, v: a + v,
        )
    )
    return (
        docs.select("doc_id", embed_udf(F.col("text")).alias("embedding"))
        .select(
            "doc_id",
            F.size(emb).alias("dim"),
            F.round(norm, 4).alias("norm"),
            F.round(F.aggregate(dbl, F.lit(0.0), lambda a, v: a + v), 4).alias(
                "component_sum"
            ),
        )
    )


EXTRACT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("extracted_text", StringType()),
        StructField("n_parts", LongType()),
        StructField("n_words", LongType()),
    ]
)


def make_text_extractor(rate_per_batch_sleep: float | None = None):
    """U3/U4: binary→text extraction as a mapInPandas stage (stands in for
    the LlamaParse markdown extraction at docproc/format_config.py:147-230,
    batch driver :232-302).

    Deterministic stub: utf-8 decode, split into ~40-word "parts", join
    with the reference's part separator. ``rate_per_batch_sleep`` is the
    U4 client-side rate-limit seam (enricher.py:357-414 sleeps 1s every
    max_concurrent) — None in tests, a positive float against a real
    parser API."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time

        for pdf in batches:
            if rate_per_batch_sleep:
                time.sleep(rate_per_batch_sleep)
            texts = pdf["payload"].map(
                lambda b: bytes(b).decode("utf-8", errors="replace")
            )
            words = texts.str.split(" ")
            parts = words.map(
                lambda w: [" ".join(w[i : i + 40]) for i in range(0, len(w), 40)]
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "extracted_text": parts.map("\n\n".join),
                    "n_parts": parts.map(len).astype("int64"),
                    "n_words": words.map(len).astype("int64"),
                }
            )

    return extract


def u3_text_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document text extraction over the binary modality column (rows-only:
    pandas-UDF stage; unit tests pin the part/word counts)."""
    from .multimodal import with_binary_payload

    docs = with_binary_payload(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "payload"
    )
    return docs.mapInPandas(make_text_extractor(), schema=EXTRACT_SCHEMA)


def u5_urgency_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Urgency heuristic (enricher.py:313-355) — pure column expressions,
    no UDF needed (SURVEY.md §2.8 U5): recency + magnitude blend."""
    orders = load_table(spark, sf_dir, "orders")
    days_old = F.datediff(
        F.to_date(F.lit("1998-08-01")), F.col("o_orderdate").cast("date")
    )
    recency = F.greatest(F.lit(0.0), 1 - days_old / F.lit(1500.0))
    magnitude = F.least(F.col("o_totalprice") / F.lit(300000.0), F.lit(1.0))
    return orders.select(
        "o_orderkey",
        F.round(
            F.least(F.greatest(F.lit(0.6) * recency + F.lit(0.4) * magnitude,
                               F.lit(0.0)), F.lit(1.0)),
            6,
        ).alias("urgency"),
    )


QUERIES = {
    "u1_insight_extraction": u1_insight_extraction,
    "u2_hash_embedding": u2_hash_embedding,
    "u3_text_extraction": u3_text_extraction,
    "u5_urgency_score": u5_urgency_score,
}

ORACLES = {
    # u1/u2/u3: rows-only — pandas-UDF operators (deterministic stubs
    # pinned by unit tests instead of SQL oracles).
    "u5_urgency_score": """
        SELECT o_orderkey,
               round(least(greatest(
                 0.6 * greatest(0.0, 1 - date_diff('day', CAST(o_orderdate AS DATE),
                                                   DATE '1998-08-01') / 1500.0)
                 + 0.4 * least(o_totalprice / 300000.0, 1.0), 0.0), 1.0), 6) AS urgency
        FROM orders
    """,
}
