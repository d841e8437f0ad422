"""Public functions API: composable column builders behave standalone."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from caseguarddatapipeline_spark import functions as CF


def test_text_functions_compose(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "a a a a")], ["id", "text"]
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            CF.token_count(F.col("text")).alias("n"),
            F.round(CF.stopword_ratio(F.col("text")), 4).alias("sr"),
            F.round(CF.quality_score(F.col("text")), 4).alias("q"),
        ).collect()
    }
    assert out[1]["n"] == 4 and out[1]["sr"] == 0.25
    assert out[2]["sr"] == 1.0
    assert 0.0 <= out[2]["q"] < out[1]["q"] <= 1.0


def test_vector_functions(spark):
    df = spark.createDataFrame(
        [([3.0, 4.0], [3.0, 4.0]), ([1.0, 0.0], [0.0, 1.0])], ["a", "b"]
    )
    rows = df.select(
        F.round(CF.l2_norm(F.col("a")), 6).alias("n"),
        F.round(CF.cosine(F.col("a"), F.col("b")), 6).alias("c"),
    ).collect()
    assert rows[0]["n"] == 5.0 and rows[0]["c"] == 1.0
    assert rows[1]["c"] == 0.0


def test_hash_pipeline_matches_python_twin(spark):
    df = spark.createDataFrame([("spark",)], ["tok"])
    got = df.select(CF.token_hash(F.col("tok")).alias("h")).collect()[0]["h"]
    acc = 0
    for ch in "spark":
        acc = (acc * 131 + ord(ch)) % CF.MERSENNE_31
    assert got == acc


def test_minhash_via_api_matches_operator(spark, sf_dir):
    from caseguarddatapipeline_spark.sources import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .limit(20)
        .select("doc_id", CF.tokens(F.col("text")).alias("toks0"))
        .select("doc_id", F.filter("toks0", lambda t: t != "").alias("toks"))
        .select("doc_id", F.transform("toks", CF.token_hash).alias("th"))
        .select("doc_id", CF.hashed_shingles(F.col("th")).alias("sh"))
        .select("doc_id", CF.minhash_signature(F.col("sh")).alias("sig"))
    )
    rows = docs.collect()
    assert all(len(r["sig"]) == 16 for r in rows)
    assert all(all(0 <= v < CF.MERSENNE_31 for v in r["sig"]) for r in rows)


def test_corpus_hygiene_functions(spark):
    df = spark.createDataFrame(
        [(1, "the fast  Fox"), (2, "a a a a")], "id long, text string"
    )
    out = df.select(
        "id",
        CF.distinct_ratio(F.col("text")).alias("dr"),
        CF.normalize_text(F.col("text")).alias("norm"),
        CF.seeded_draw(F.col("id")).alias("draw"),
        CF.seeded_order_key(F.col("id")).alias("okey"),
    ).collect()
    by_id = {r.id: r for r in out}
    assert by_id[2].dr == 0.25
    assert by_id[1].norm == "the fast fox"
    assert 0.0 <= by_id[1].draw < 1.0
    assert by_id[1].draw != by_id[2].draw
    assert len(by_id[1].okey) == 32  # md5 hex

    # mean_word_len under single-space tokenization
    m = spark.createDataFrame([("ab cd",)], "text string").select(
        CF.mean_word_len(F.col("text")).alias("m")
    ).collect()[0].m
    assert m == 2.0
