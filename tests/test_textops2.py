"""BPE-ish regex tokenizer (E3) and frame sampling (E4) semantics."""

from __future__ import annotations

import pyspark.sql.functions as F

from caseguarddatapipeline_spark.operators.multimodal import (
    FRAME_SIZE,
    FRAME_STRIDE,
    e4_frame_sample,
)
from caseguarddatapipeline_spark.operators.textops import e3_bpe_tokens


def test_bpe_pieces_vs_ws_tokens(spark, sf_dir):
    df = e3_bpe_tokens(spark, sf_dir)
    # piece count can never be below the whitespace token count (every
    # whitespace token yields >= 1 piece) and never zero for nonempty docs
    assert df.filter(F.col("n_pieces") < F.col("n_ws_tokens")).count() == 0
    assert df.filter(F.col("n_pieces") <= 0).count() == 0


def test_bpe_known_string(spark):
    df = spark.createDataFrame([[1, "Hello, world42 x!"]], ["doc_id", "text"])
    pieces = F.regexp_extract_all(
        "text", F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1
    )
    got = df.select(pieces.alias("p")).first()["p"]
    assert got == ["Hello", ",", "world", "42", "x", "!"]


def test_frame_sample_stride_and_bounds(spark, sf_dir):
    df = e4_frame_sample(spark, sf_dir)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r["frame_index"] % FRAME_STRIDE == 0
        assert r["byte_offset"] == r["frame_index"] * FRAME_SIZE
        assert 0 < r["frame_len"] <= FRAME_SIZE
    # every sampled doc contains frame 0
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_index"])
    assert all(0 in v for v in by_doc.values())
