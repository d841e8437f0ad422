"""Round-7 operator semantics: winnowing fingerprints + the MOSS-style
near-dup join, bigram-LM quality scoring, SQ8 scalar-quantized ANN, and
Markov event transitions. Exact-value parity is the driver oracle's job;
these pin the algorithmic GUARANTEES (winnowing's shared-run property,
quantization error bounds, probability normalization) that a hash-equal
oracle can't articulate."""

from __future__ import annotations

import pyspark.sql.functions as F

from caseguarddatapipeline_spark.operators.dedup import (
    WINNOW_TAU,
    e1_winnow_join,
)
from caseguarddatapipeline_spark.operators.pq import (
    TOPK,
    e2_sq8_search,
)
from caseguarddatapipeline_spark.operators.sessions import (
    w14_event_transitions,
)
from caseguarddatapipeline_spark.operators.textops import (
    WINNOW_K,
    WINNOW_W,
    e3_ngram_lm_score,
    winnow_postings,
)
from caseguarddatapipeline_spark.sources import load_table


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_winnow_shared_run_guarantee(spark):
    """The winnowing theorem: two docs sharing any run of
    WINNOW_K + WINNOW_W - 1 tokens select at least one common
    fingerprint, regardless of surrounding text."""
    run = "alpha beta gamma delta epsilon zeta"  # 6 = K + W - 1 tokens
    assert len(run.split()) == WINNOW_K + WINNOW_W - 1
    docs = _docs_df(
        spark,
        [
            (1, f"xx yy {run} zz ww vv uu"),
            (2, f"aa bb cc dd {run} ee"),
        ],
    )
    posts = winnow_postings(docs).collect()
    fps1 = {r.fp for r in posts if r.doc_id == 1}
    fps2 = {r.fp for r in posts if r.doc_id == 2}
    assert fps1 & fps2, "shared 6-token run must share a fingerprint"


def test_winnow_short_doc_degradation(spark):
    """< K tokens → no fingerprints; >= K but < K+W-1 → exactly the
    global minimum (one fingerprint)."""
    docs = _docs_df(spark, [(1, "one two"), (2, "one two three four")])
    posts = winnow_postings(docs).groupBy("doc_id").count().collect()
    counts = {r.doc_id: r["count"] for r in posts}
    assert 1 not in counts  # 2 tokens < K: nothing selected
    assert counts[2] == 1  # 2 k-grams < W: one window, its minimum


def test_winnow_join_pairs_share_tau(spark, sf_dir):
    pairs = e1_winnow_join(spark, sf_dir)
    rows = pairs.collect()
    assert rows, "fixture corpus contains planted near-dups"
    assert all(r.n_shared >= WINNOW_TAU for r in rows)
    assert all(r.doc_a < r.doc_b for r in rows)


def test_winnow_join_precision_recall_vs_minhash(spark, sf_dir):
    """Cross-sketch agreement: winnowing certifies shared PASSAGES, so
    its pairs must be a SUBSET of the MinHash-LSH near-dup pairs (100%
    precision against the Jaccard sketch on this corpus — shared runs
    imply shared shingles) while recovering most of the high-similarity
    pairs (recall ≥ 0.7 at jaccard ≥ 0.9; the remainder are short docs
    whose few fingerprints fall under the df cap or the τ floor —
    measured 22/27 at sf0.001)."""
    from caseguarddatapipeline_spark.operators.dedup import e1_minhash_lsh

    mh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in e1_minhash_lsh(spark, sf_dir).collect()
    }
    found = {(r.doc_a, r.doc_b) for r in e1_winnow_join(spark, sf_dir).collect()}
    assert found, "fixture corpus contains planted near-dups"
    assert found <= set(mh), f"winnow-only pairs: {found - set(mh)}"
    strong = {p for p, j in mh.items() if j >= 0.9}
    assert strong
    assert len(found & strong) / len(strong) >= 0.7


def test_ngram_lm_score_shape(spark, sf_dir):
    scored = e3_ngram_lm_score(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n_scorable = docs.filter(F.size(F.split("text", " ")) >= 2).count()
    rows = scored.collect()
    assert len(rows) == n_scorable
    # smoothed probabilities are < 1 → log-micro sums strictly negative,
    # and the mean is consistent with the sum
    assert all(r.sum_logp_micro < 0 for r in rows)
    assert all(
        abs(r.avg_logp_micro - r.sum_logp_micro / r.n_bigrams) <= 0.5
        for r in rows
    )


def test_ngram_lm_ranks_familiar_transitions(spark, sf_dir):
    """A document whose every bigram is corpus-frequent must outscore one
    built from transitions the corpus never makes. Scores are per-doc
    means, so this pins the signal direction end-to-end."""
    scored = {
        r.doc_id: r.avg_logp_micro
        for r in e3_ngram_lm_score(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").collect()
    texts = {r.doc_id: r.text for r in docs}
    # corpus-wide bigram counts (driver-side, fixture is tiny)
    from collections import Counter

    bg = Counter()
    for t in texts.values():
        toks = t.split(" ")
        bg.update(zip(toks, toks[1:]))
    doc_mean_freq = {
        d: sum(bg[p] for p in zip(t.split(" "), t.split(" ")[1:]))
        / max(1, len(t.split(" ")) - 1)
        for d, t in texts.items()
        if len(t.split(" ")) >= 2
    }
    most = max(doc_mean_freq, key=doc_mean_freq.get)
    least = min(doc_mean_freq, key=doc_mean_freq.get)
    assert scored[most] > scored[least]


def test_sq8_approximates_exact_distance(spark, sf_dir):
    """8-bit linear quantization bounds the per-dimension error at
    (hi-lo)/510, so the approximate distance of every returned candidate
    must sit within a few percent of its exact L2 distance."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    exact = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.aggregate(
                F.zip_with("q_emb", "emb", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("d_exact"),
        )
    )
    got = e2_sq8_search(spark, sf_dir).join(exact, ["query_id", "vec_id"])
    rows = got.collect()
    assert len(rows) == 5 * TOPK
    for r in rows:
        assert abs(r.adist - r.d_exact) <= 0.05 * max(r.d_exact, 1.0), (
            r.query_id,
            r.vec_id,
            r.adist,
            r.d_exact,
        )


def test_w14_transitions_conservation(spark, sf_dir):
    """Total transition count = Σ_users (n_events − 1), and each source
    state's per-mille shares sum to 1000 within rounding slack."""
    trans = w14_event_transitions(spark, sf_dir)
    rows = trans.collect()
    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").count().collect()
    expected = sum(r["count"] - 1 for r in per_user)
    assert sum(r.n for r in rows) == expected
    by_src = {}
    for r in rows:
        by_src.setdefault(r.event_type, []).append(r.share_milli)
        assert 0 <= r.share_milli <= 1000
    for src, shares in by_src.items():
        assert abs(sum(shares) - 1000) <= len(shares), src
