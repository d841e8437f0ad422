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


def test_bm25_scores_match_formula(spark, tmp_path):
    """BM25 on a constructed corpus must reproduce the closed-form score
    (saturation k1=1.2, length norm b=0.75) and rank a short relevant doc
    above a long one with equal term frequency."""
    import math

    from caseguarddatapipeline_spark.operators import textops as T

    docs = {
        0: ["scan"] * 1 + ["x"] * 9,            # tf=1, dl=10
        1: ["scan"] * 1 + ["y"] * 49,           # tf=1, dl=50 (longer -> lower)
        2: ["scan"] * 3 + ["z"] * 7,            # tf=3, dl=10 (saturated boost)
        3: ["agg", "scan"] + ["w"] * 8,         # both terms
        4: ["q"] * 12,                          # no terms -> absent
    }
    spark.createDataFrame(
        [(d, " ".join(t)) for d, t in docs.items()], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    n_docs = len(docs)
    sum_dl = sum(len(t) for t in docs.values())
    df = {"scan": 4, "agg": 1}

    def bm25(toks):
        score = 0.0
        dl = len(toks)
        for term in ("scan", "agg"):
            tf = toks.count(term)
            if not tf:
                continue
            idf = math.log(1.0 + (n_docs - df[term] + 0.5) / (df[term] + 0.5))
            score += (
                idf
                * (tf * (T.BM25_K1 + 1.0))
                / (tf + T.BM25_K1 * ((1.0 - T.BM25_B)
                                     + T.BM25_B * dl * n_docs / sum_dl))
            )
        return score

    got = {r["doc_id"]: r["score"] for r in T.e3_bm25_search(spark, str(tmp_path)).collect()}
    assert set(got) == {0, 1, 2, 3}
    for d in got:
        assert abs(got[d] - bm25(docs[d])) < 1e-6, (d, got[d], bm25(docs[d]))
    assert got[2] > got[0] > got[1]          # saturation and length norm
    assert got[2] < 3 * got[0]               # tf=3 scores FAR less than 3x
    assert got[3] == max(got.values())       # matching both terms wins


def test_vocab_induction_matches_bruteforce(spark, tmp_path):
    """First-round BPE pair counts must equal a brute-force count over
    (word frequency x within-word occurrences), including the repeated
    pair inside 'aaa' and the single-char word exclusion."""
    from collections import Counter

    from caseguarddatapipeline_spark.operators import textops as T

    docs = {
        0: "aaa bb aaa cd",
        1: "bb cd cd x",      # 'x' has no pairs
        2: "abab",
    }
    spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    words = Counter(w for t in docs.values() for w in t.split(" ") if w)
    expected = Counter()
    for w, n in words.items():
        for i in range(len(w) - 1):
            expected[w[i : i + 2]] += n
    assert "aa" in expected and expected["aa"] == 4  # 2 per 'aaa' x freq 2

    got = {
        r["pair"]: r["pair_count"]
        for r in T.e3_vocab_induction(spark, str(tmp_path)).collect()
    }
    top = dict(
        sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[
            : T.BPE_TOP_PAIRS
        ]
    )
    assert got == top


def _serial_bpe(vocab, n_rounds):
    """Textbook BPE (Sennrich et al. 2016 Alg. 1) over symbol lists:
    count adjacent pairs weighted by word frequency, merge the argmax
    (count desc, sym1, sym2) greedily left-to-right, repeat."""
    segs = {w: list(w) for w in vocab}
    merges = []
    for _ in range(n_rounds):
        counts = {}
        for w, n in vocab.items():
            s = segs[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        (a, b), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append({"left": a, "right": b, "merged": a + b, "count": c})
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges


def test_bpe_learn_merges_matches_serial_reference(spark, sf_dir):
    """Four rounds of distributed merge learning equal the serial
    reference over the same vocab — counts, tie-breaks, and the greedy
    non-overlapping re-segmentation (incl. merges that extend an earlier
    merged symbol)."""
    from collections import Counter

    from caseguarddatapipeline_spark.operators.textops import bpe_learn_merges
    from caseguarddatapipeline_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    vocab = Counter(
        w
        for r in docs.select("text").collect()
        for w in r["text"].split(" ")
        if w
    )
    assert bpe_learn_merges(docs, n_rounds=4) == _serial_bpe(vocab, 4)


def test_bpe_learn_merges_overlap_and_extension(spark, tmp_path):
    """Crafted corpus: round 1 merges (a,a) — 'aaa' must count the pair
    twice but merge only once (greedy non-overlap) — and round 2 must be
    able to EXTEND the merged symbol (('aa','a') or ('aa','b') style),
    which exercises the marker-char segmentation."""
    docs_rows = [(0, "aaa aab aab"), (1, "aaa aab baa")]
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    vocab = {"aaa": 2, "aab": 3, "baa": 1}

    from caseguarddatapipeline_spark.operators.textops import bpe_learn_merges

    got = bpe_learn_merges(docs, n_rounds=3)
    assert got == _serial_bpe(vocab, 3)
    assert got[0]["left"] == "a" and got[0]["right"] == "a"
    # some later merge involves the learned 'aa' symbol
    assert any("aa" in (m["left"], m["right"]) for m in got[1:])


def test_vocab_2round_agrees_with_merge_learner(spark, sf_dir):
    """The oracle-checked 2-round catalog query and the iterative learner
    see the same world: the learner's merge #1 is the round-1 argmax the
    query re-segments with, and its merge #2 is the query's top row."""
    from caseguarddatapipeline_spark.operators.textops import (
        bpe_learn_merges,
        e3_vocab_induction,
        e3_vocab_induction_2round,
    )
    from caseguarddatapipeline_spark.sources import load_table

    merges = bpe_learn_merges(load_table(spark, sf_dir, "documents"), 2)
    r1_top = e3_vocab_induction(spark, sf_dir).limit(1).collect()[0]
    assert merges[0]["merged"] == r1_top["pair"]
    assert merges[0]["count"] == r1_top["pair_count"]
    r2_top = e3_vocab_induction_2round(spark, sf_dir).limit(1).collect()[0]
    assert r2_top["merge1"] == r1_top["pair"]
    assert (merges[1]["left"], merges[1]["right"]) == (
        r2_top["sym1"], r2_top["sym2"],
    )
    assert merges[1]["count"] == r2_top["pair_count"]


def test_bpe_deep_rounds_with_control_chars(spark):
    """Ten merge rounds over words that CONTAIN tab/newline characters:
    the old chr(1+r) marker alphabet collides with \\t at r=8 and \\n at
    r=9, silently corrupting segmentation; the private-use-area markers
    must keep the learner exact against the serial reference."""
    import pytest
    from caseguarddatapipeline_spark.operators.textops import bpe_learn_merges

    words = ["aaab", "aab\tb", "ab\nab", "bbaa", "aaaa", "b\tb\tb", "a\na\na"]
    text = " ".join(w for w in words for _ in range(3))
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    vocab = {w: 3 for w in words}
    assert bpe_learn_merges(docs, n_rounds=10) == _serial_bpe(vocab, 10)

    with pytest.raises(ValueError, match="marker alphabet"):
        bpe_learn_merges(docs, n_rounds=257)


def test_bpe_rejects_private_use_area_corpus(spark):
    """A corpus whose words already contain U+E000.. characters would be
    indistinguishable from segmentation markers — rejected up front."""
    import pytest
    from caseguarddatapipeline_spark.operators.textops import bpe_learn_merges

    docs = spark.createDataFrame(
        [(0, "normal word x pair pair")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="private-use-area"):
        bpe_learn_merges(docs, n_rounds=2)


def test_nround_winner_agrees_with_merge_learner(spark, sf_dir):
    """The relational 4-round merge table (_nround_winner — the encoder's
    zero-collect learner) must learn exactly the merges bpe_learn_merges
    learns on the same corpus: same displays, in the same order."""
    from caseguarddatapipeline_spark.operators.textops import (
        BPE_NROUNDS,
        _nround_winner,
        _vocab_words,
        bpe_learn_merges,
    )
    from caseguarddatapipeline_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    [row] = _nround_winner(_vocab_words(docs), BPE_NROUNDS).collect()
    merges = bpe_learn_merges(docs, n_rounds=BPE_NROUNDS)
    assert len(merges) == BPE_NROUNDS
    assert [row[f"d{r}"] for r in range(1, BPE_NROUNDS + 1)] == [
        m["merged"] for m in merges
    ]


def test_bpe_encode_nround_deepens_two_merge_encoder(spark, sf_dir):
    """4 merges can only compress at least as well as 2 (first two merges
    agree with e3_bpe_encode by the learner pin above), and raw counts
    are identical."""
    from caseguarddatapipeline_spark.operators.textops import (
        e3_bpe_encode,
        e3_bpe_encode_nround,
    )

    two = {
        r["doc_id"]: r for r in e3_bpe_encode(spark, sf_dir).collect()
    }
    four = {
        r["doc_id"]: r
        for r in e3_bpe_encode_nround(spark, sf_dir).collect()
    }
    assert set(two) == set(four)
    assert any(
        four[d]["n_sym_bpe"] < two[d]["n_sym_bpe"] for d in four
    ), "the extra merges never fired"
    for d, r in four.items():
        assert r["n_sym_raw"] == two[d]["n_sym_raw"]
        assert r["n_sym_bpe"] <= two[d]["n_sym_bpe"]
