"""Text analysis operators (E3, SURVEY.md §2.10): token counting, quality
scoring, language-ID heuristic, document fingerprinting, tf-idf.

All pure column expressions over ``documents.text`` — tokenization via
split, higher-order array functions for per-doc statistics. At 100 TB these
run as a single scan + narrow transforms (no shuffle except the final
aggregates), fully inside whole-stage codegen; there is no Python anywhere.

Reference anchors: the embedder's summary-text assembly and truncation
(caseguard/vectorization/embedder.py:76-151) and the docproc text pipeline
(docproc/format_config.py:147-230) are the reference's only text handling —
the E3 operators extend them to corpus-level analytics per the build brief.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources import load_table

STOPWORDS = ["the", "a", "of", "and", "to"]
_LANG_MARKERS = {"de": "der", "fr": "le", "es": "el", "zh": "shi"}


def _tokens():
    return F.split(F.col("text"), " ")


def _trigrams(toks):
    """Word trigrams of a token-array column. Guarded for short docs:
    sequence(1, size-2) with size < 3 would generate a DESCENDING
    sequence ([1, 0]) and element_at(toks, 0) throws under ANSI — a
    1-token document must yield an EMPTY trigram list (matching the
    oracles' exclusive range(1, len-1))."""
    idx = F.when(
        F.size(toks) >= 3, F.sequence(F.lit(1), F.size(toks) - 2)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i),
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
        ),
    )


def e3_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting rolled up per language×source."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    return (
        docs.select("lang", "source", F.size(toks).alias("n_tokens"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        )
    )


def e3_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: length, stopword ratio, avg token length
    → weighted score in [0,1]. The training-data-pipeline quality filter.

    One spark.sql parse (round-13 serving optimization — this was the
    most expensive plan BUILD of the non-SQL headliners, ~66 ms of py4j
    expression hops). D-suffixed literals keep every term in DOUBLE,
    exactly like the F.lit forms; single-space tokenization ⇒ avg token
    length is arithmetic on lengths, no per-token loop needed."""
    from ..sources.tables import scoped_views

    v = scoped_views(spark, sf_dir)
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    stop_ratio = (
        f"CAST(size(filter(toks, t -> t IN ({stop_list}))) AS DOUBLE)"
        " / size(toks)"
    )
    avg_tok = "CAST(length(text) - (size(toks) - 1) AS DOUBLE) / size(toks)"
    return spark.sql(f"""
        SELECT doc_id,
               size(toks) AS n_tokens,
               round({stop_ratio}, 6) AS stopword_ratio,
               round({avg_tok}, 6) AS avg_token_len,
               round(0.5D * least(size(toks) / 100.0D, 1.0D)
                     + 0.3D * (1.0D - {stop_ratio})
                     + 0.2D * least(({avg_tok}) / 10.0D, 1.0D),
                     6) AS quality_score
        FROM (SELECT doc_id, text, split(text, ' ') AS toks
              FROM {v['documents']})
    """)


def e3_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic vs the labeled lang — confusion
    counts per (true, guessed) pair. (A real system uses char-n-gram
    profiles; the heuristic keeps the oracle exact.)"""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    # Build the when-chain innermost-first so marker priority matches the
    # oracle's CASE order (de > fr > es > zh).
    guess = F.lit("en")
    for lang, marker in reversed(list(_LANG_MARKERS.items())):
        guess = F.when(F.array_contains(toks, marker), F.lit(lang)).otherwise(guess)
    return (
        docs.select(F.col("lang").alias("true_lang"), guess.alias("guessed_lang"))
        .groupBy("true_lang", "guessed_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def e3_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial fingerprint over tokens (document fingerprinting
    for near-dup indexing). Pure-arithmetic per-token codes keep it exactly
    reproducible in any engine (no engine hash functions)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    codes = F.transform(
        toks,
        lambda t: (F.ascii(t).cast("bigint") * 31 + F.length(t).cast("bigint")),
    )
    fp = F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * 131 + x) % F.lit(1000000007).cast("bigint"),
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


def e3_tfidf_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf of the term 'spark' per document: tf from a per-doc token
    filter, df from a corpus-level agg broadcast back (scalar cross join —
    broadcast, no shuffle of the doc side)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    tf = F.size(F.filter(toks, lambda t: t == F.lit("spark")))
    per_doc = docs.select("doc_id", tf.alias("tf"))
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs_total"),
        F.count(F.when(F.col("tf") > 0, 1)).alias("df"),
    )
    return (
        per_doc.crossJoin(F.broadcast(stats))
        .filter(F.col("tf") > 0)
        .select(
            "doc_id",
            "tf",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs_total").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )


def e3_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: a GPT-2-style pre-tokenizer regex
    (letter runs | digit runs | single punctuation) counted per doc, next
    to the whitespace count and the chars/4 rule-of-thumb. regexp_extract_all
    stays in codegen; the simple character classes behave identically in
    Java regex (Spark) and RE2 (DuckDB), keeping the oracle exact."""
    docs = load_table(spark, sf_dir, "documents")
    pieces = F.regexp_extract_all("text", F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1)
    return docs.select(
        "doc_id",
        "lang",
        F.size(pieces).alias("n_pieces"),
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.ceil(F.length("text") / 4).alias("est_bpe_tokens"),
    )


SEARCH_TERMS = ["scan", "agg"]


def e3_ranked_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-term AND search with tf-idf ranking (the engine-side version
    of the reference's search_cases endpoint, client.py:262-291): explode
    tokens → keep query terms → require every term present (HAVING
    distinct-terms = |query|) → score by summed tf·idf, top 20.

    This is the inverted-index query shape: the exploded (term, doc)
    stream shuffles once on the term filter's survivors only (the posting
    lists), never the full corpus; idf comes from a 2-row broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    postings = (
        docs.select("doc_id", F.explode(_tokens()).alias("term"))
        .filter(F.col("term").isin(SEARCH_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    totals = docs.agg(F.count(F.lit(1)).alias("n_docs_total"))
    scored = (
        postings.join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "tfidf",
            F.col("tf")
            * F.log(F.col("n_docs_total").cast("double") / F.col("df")),
        )
        .groupBy("doc_id")
        .agg(
            F.count_distinct("term").alias("n_terms"),
            F.round(F.sum("tfidf"), 6).alias("score"),
        )
        .filter(F.col("n_terms") == len(SEARCH_TERMS))
    )
    return (
        scored.select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


def e3_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-trigram fraction per document — the repetition quality
    signal corpus filters use (boilerplate / looping generations show
    high ratios): 1 − distinct-trigrams / total-trigrams. Pure column
    expressions (narrow, no shuffle) like the rest of E3; downstream
    curation would add ``repetition ≤ τ`` to the quality predicate."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    tri = _trigrams(toks)
    return (
        docs.select("doc_id", "lang", tri.alias("tri"))
        .select(
            "doc_id",
            "lang",
            F.size("tri").alias("n_trigrams"),
            F.size(F.array_distinct("tri")).alias("n_distinct"),
        )
        .select(
            "doc_id",
            "lang",
            "n_trigrams",
            "n_distinct",
            F.round(
                1.0 - F.col("n_distinct") / F.col("n_trigrams").cast("double"), 6
            ).alias("repetition_ratio"),
        )
    )


def e3_trigram_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistical quality signal: how 'familiar' each document's
    word trigrams are relative to the whole corpus — the fully-relational
    stand-in for the n-gram-LM perplexity filters corpus pipelines run
    (low familiarity ≈ rare/garbled text, very high ≈ boilerplate).
    Build the LM (trigram → corpus count, one explode + groupBy shuffle),
    join each document's trigrams back against it (equi-join on the
    trigram; AQE splits the hot-trigram skew), and aggregate an INTEGER
    familiarity: fam_milli = half-up((Σ counts × 1000) / n_trigrams) — no
    float logs, so parity is exact. At 100 TB the trigram key becomes a
    64-bit hash and the LM table is bucketed on it; the shape is
    unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    tri = _trigrams(toks)
    exploded = docs.select(
        "doc_id", "lang", F.explode(tri).alias("trigram")
    )
    # Round 13 (optimization, the e3_ngram_lm_score roll-up trick): the
    # LM used to aggregate the exploded trigram STREAM while the join
    # side re-read the same stream — two full tokenize+explode passes.
    # Both sides now derive from ONE per-(doc, trigram) count table
    # (identical canonical subtree → the exchange is computed once and
    # reused): corpus_count = Σ_doc c_doc, n_trigrams = Σ c_doc,
    # sum_counts = Σ c_doc·corpus_count — the same integers, summed by
    # group instead of by instance.
    per_doc = exploded.groupBy("doc_id", "lang", "trigram").agg(
        F.count(F.lit(1)).alias("c_doc")
    )
    lm = per_doc.groupBy("trigram").agg(
        F.sum("c_doc").cast("bigint").alias("corpus_count")
    )
    return (
        per_doc.join(lm, "trigram")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("c_doc").cast("bigint").alias("n_trigrams"),
            F.sum(F.col("c_doc") * F.col("corpus_count"))
            .cast("bigint")
            .alias("sum_counts"),
        )
        .select(
            "doc_id",
            "lang",
            "n_trigrams",
            "sum_counts",
            F.expr(
                "(2 * sum_counts * 1000 + n_trigrams) DIV (2 * n_trigrams)"
            ).alias("fam_milli"),
        )
    )


BPE_TOP_PAIRS = 20


def e3_vocab_induction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary INDUCTION, first merge round (Sennrich et al. 2016):
    corpus-weighted counts of adjacent character pairs, whose argmax is
    the first merge a BPE tokenizer learns — the TRAINING side of
    tokenization, complementing ``e3_bpe_tokens`` which only applies a
    pre-tokenizer. Emits the top-``BPE_TOP_PAIRS`` merge candidates with
    exact counts (each occurrence counts, so "aaa" contributes "aa"
    twice, weighted by the word's corpus frequency), total-ordered by
    (count desc, pair) for a deterministic oracle.

    The scale trick is the classic one: pair counting runs over the
    DISTINCT-WORD table with frequencies, not the token stream — one
    corpus-wide shuffle builds the (word, n) vocab, and everything after
    is bounded by vocabulary size (≪ corpus size; Zipf makes the vocab
    table tiny even at 100 TB of text). Later merge rounds re-segment the
    same vocab table iteratively; round 1 is the driver-checkable shape
    with an exact SQL oracle."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(
                F.filter(_tokens(), lambda t: t != "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = words.filter(F.length("word") >= 2).select(
        "n",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").cast("bigint").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(BPE_TOP_PAIRS)
    )


_BPE_MARK = "\x01"  # round-1 merged-symbol placeholder (corpus is pure ASCII)


def _vocab_words(docs: DataFrame) -> DataFrame:
    """The distinct-word frequency table every BPE round runs over —
    ONE corpus-wide shuffle; everything after is bounded by |vocab|."""
    return (
        docs.select(
            F.explode(F.filter(_tokens(), lambda t: t != "")).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def e3_vocab_induction_2round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary induction, SECOND merge round — the iterative step
    e3_vocab_induction's docstring promises: learn merge #1 (the round-1
    pair argmax), RE-SEGMENT the vocab with it, and recount adjacent
    symbol pairs over the new segmentation. Pins the iteration count to
    2 exactly the way e2_ivf_search_2round pins Lloyd rounds, so the
    whole pipeline stays plain relational algebra with an exact oracle;
    the unbounded loop lives in ``bpe_learn_merges``.

    Re-segmentation is the single-merge trick: applying one merge (a,b)
    greedily left-to-right over a word's symbol string IS
    ``replace(word, a||b, <marker>)`` — both engines replace
    non-overlapping occurrences leftmost-first, which is exactly the BPE
    merge rule, and the marker char (\\x01, absent from the ASCII corpus)
    keeps the merged symbol atomic for round-2 pair extraction. The
    winning pair rides a 1-row broadcast (no collect); output symbols map
    the marker back to its display string. Emits the top-BPE_TOP_PAIRS
    round-2 candidates as (merge1, sym1, sym2, pair_count), total-ordered.

    Scale: identical posture to round 1 — pair counting over the
    |vocab|-bounded word table, one groupBy shuffle per round, the merge
    table itself is O(rounds) driver metadata at most (here: zero, it
    stays a broadcast)."""
    docs = load_table(spark, sf_dir, "documents")
    words = _vocab_words(docs)
    pairs1 = words.filter(F.length("word") >= 2).select(
        "n",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    winner = (
        pairs1.groupBy("pair")
        .agg(F.sum("n").alias("c"))
        .orderBy(F.desc("c"), F.asc("pair"))
        .limit(1)
        .select(F.col("pair").alias("merge1"))
    )
    seg = words.crossJoin(F.broadcast(winner)).select(
        "n",
        "merge1",
        F.replace(F.col("word"), F.col("merge1"), F.lit(_BPE_MARK)).alias("w"),
    )
    pairs2 = seg.filter(F.length("w") >= 2).select(
        "n",
        "merge1",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.struct(
                    F.col("w").substr(i, F.lit(1)).alias("c1"),
                    F.col("w").substr(i + 1, F.lit(1)).alias("c2"),
                ),
            )
        ).alias("p"),
    )

    def disp(c):
        return F.when(c == _BPE_MARK, F.col("merge1")).otherwise(c)

    return (
        pairs2.select(
            "n",
            "merge1",
            disp(F.col("p.c1")).alias("sym1"),
            disp(F.col("p.c2")).alias("sym2"),
        )
        .groupBy("merge1", "sym1", "sym2")
        .agg(F.sum("n").cast("bigint").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("sym1"), F.asc("sym2"))
        .limit(BPE_TOP_PAIRS)
    )


_BPE_MARK2 = "\x02"  # round-2 merged-symbol placeholder


def e3_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING — the application side that closes the tokenizer
    loop (induction learns merges: e3_vocab_induction/_2round; this
    applies them to every document): learn merge #1 and merge #2 exactly
    as the 2-round induction does (vocab-table pair argmax, re-segment,
    argmax again — iteration count pinned for the exact oracle), then
    encode EVERY document by greedy left-to-right merge application and
    emit per-doc symbol counts before/after plus the compression ratio —
    the per-document token-budget signal a corpus assembler feeds its
    packing and budget stages once a real tokenizer is plugged in.

    Applying one merge greedily IS ``replace(word, pair, marker)`` (the
    _2round re-segmentation identity), so the whole encoder is two
    nested replaces inside one higher-order aggregate over the per-doc
    token array — pure codegen'd column algebra over the corpus scan.
    The two learned merges ride a 1-row broadcast. Scale: the merge
    LEARNING is |vocab|-bounded (Zipf), the ENCODING is one map-side
    pass over documents with zero data-sized shuffles — the posture a
    100 TB tokenize-and-count job needs."""
    docs = load_table(spark, sf_dir, "documents")
    words = _vocab_words(docs)
    pairs1 = words.filter(F.length("word") >= 2).select(
        "n",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    winner1 = (
        pairs1.groupBy("pair")
        .agg(F.sum("n").alias("c"))
        .orderBy(F.desc("c"), F.asc("pair"))
        .limit(1)
        .select(F.col("pair").alias("merge1"))
    )
    seg = words.crossJoin(F.broadcast(winner1)).select(
        "n",
        "merge1",
        F.replace(F.col("word"), F.col("merge1"), F.lit(_BPE_MARK)).alias("w"),
    )
    pairs2 = seg.filter(F.length("w") >= 2).select(
        "n",
        "merge1",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair2"),
    )
    winner2 = (
        pairs2.groupBy("merge1", "pair2")
        .agg(F.sum("n").alias("c"))
        .orderBy(F.desc("c"), F.asc("pair2"))
        .limit(1)
        .select("merge1", F.col("pair2").alias("merge2"))
    )
    toks = F.filter(_tokens(), lambda t: t != "")
    raw_len = F.aggregate(
        F.col("toks"),
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.length(w),
    )
    bpe_len = F.aggregate(
        F.col("toks"),
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.length(
            F.replace(
                F.replace(w, F.col("merge1"), F.lit(_BPE_MARK)),
                F.col("merge2"),
                F.lit(_BPE_MARK2),
            )
        ),
    )
    # two-step projection: Spark does not CSE inside HOF lambdas (see
    # _shingles), so compression derives from the materialized counts
    counts = (
        docs.select("doc_id", toks.alias("toks"))
        .crossJoin(F.broadcast(winner2))
        .select(
            "doc_id",
            raw_len.alias("n_sym_raw"),
            bpe_len.alias("n_sym_bpe"),
        )
    )
    return counts.select(
        "doc_id",
        "n_sym_raw",
        "n_sym_bpe",
        F.round(
            F.col("n_sym_bpe").cast("double")
            / F.greatest(F.col("n_sym_raw"), F.lit(1)).cast("double"),
            6,
        ).alias("compression"),
    )


_NROUND_MARKS = ["\x01", "\x02", "\x03", "\x04"]  # pinned-depth markers
BPE_NROUNDS = 4


def _nround_winner(words: DataFrame, n_rounds: int = BPE_NROUNDS) -> DataFrame:
    """The N-round BPE merge table learned RELATIONALLY: a 1-row frame
    with columns s1..sN (each round's merge as a 2-char search string in
    the marker encoding of its round) and d1..dN (the merge's DISPLAY
    string — markers expanded to their learned text). Same algebra as
    ``bpe_learn_merges`` (pair argmax over the vocab table, display-order
    tie-break, re-segment by literal replace) with the loop unrolled so
    the whole thing stays one DataFrame DAG with zero collects — the
    merge metadata rides Spark's own 1-row broadcasts, and the exact SQL
    oracle composes round-over-round CTEs the same way.
    tests/test_textops2.py pins the learned displays equal to
    ``bpe_learn_merges``' on the fixture corpus. Each round re-derives
    its predecessors in the DAG (2^N vocab-table aggs), fine at the
    pinned N=4 since every agg is |vocab|-bounded (Zipf)."""
    if n_rounds > len(_NROUND_MARKS):
        raise ValueError(f"n_rounds > {len(_NROUND_MARKS)} needs more markers")
    cur = words.select(F.col("word").alias("w"), "n")
    acc: DataFrame | None = None
    for r in range(1, n_rounds + 1):
        prev = [f"s{k}" for k in range(1, r)] + [f"d{k}" for k in range(1, r)]
        src = cur if acc is None else cur.crossJoin(F.broadcast(acc))

        def disp(c):
            out = c
            for k in range(1, r):
                out = F.when(
                    c == _NROUND_MARKS[k - 1], F.col(f"d{k}")
                ).otherwise(out)
            return out

        pairs = src.filter(F.length("w") >= 2).select(
            "n",
            *prev,
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("w") - 1),
                    lambda i: F.struct(
                        F.col("w").substr(i, F.lit(1)).alias("c1"),
                        F.col("w").substr(i + 1, F.lit(1)).alias("c2"),
                    ),
                )
            ).alias("p"),
        )
        acc = (
            pairs.select(
                "n",
                *prev,
                F.col("p.c1").alias("c1"),
                F.col("p.c2").alias("c2"),
                disp(F.col("p.c1")).alias("e1"),
                disp(F.col("p.c2")).alias("e2"),
            )
            .groupBy(*prev, "c1", "c2", "e1", "e2")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.desc("c"), F.asc("e1"), F.asc("e2"))
            .limit(1)
            .select(
                *prev,
                F.concat("c1", "c2").alias(f"s{r}"),
                F.concat("e1", "e2").alias(f"d{r}"),
            )
        )
        cur = cur.crossJoin(F.broadcast(acc.select(f"s{r}"))).select(
            F.replace(
                F.col("w"), F.col(f"s{r}"), F.lit(_NROUND_MARKS[r - 1])
            ).alias("w"),
            "n",
        )
    assert acc is not None
    return acc


def e3_bpe_encode_nround(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE encoding with ALL ``BPE_NROUNDS`` learned merges applied
    (round-10: the 2-merge ``e3_bpe_encode`` closed the tokenizer loop;
    this exercises the nested-replace composition at the depth a real
    vocabulary needs). The merge table is learned relationally
    (``_nround_winner`` — zero collects, display-order tie-break matching
    ``bpe_learn_merges``) and applied to every document as a 4-deep
    replace chain over the raw text: search strings never contain a
    space, so whole-text replacement equals per-token replacement and
    the encoder is ONE map-side string pass — no token-array explode at
    all. Emits per-doc symbol counts before/after + compression ratio.
    Scale: learning is |vocab|-bounded; encoding is a map-side scan with
    the 4 merges on a 1-row broadcast — zero data-sized shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    wn = _nround_winner(_vocab_words(docs), BPE_NROUNDS)
    enc = F.col("text")
    for r in range(1, BPE_NROUNDS + 1):
        enc = F.replace(enc, F.col(f"s{r}"), F.lit(_NROUND_MARKS[r - 1]))
    raw = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    # markers/searches never contain spaces, so the space count is
    # invariant under the replace chain: bpe = len(enc) − n_spaces
    bpe = F.length(enc) - (F.length("text") - raw)
    return (
        docs.crossJoin(F.broadcast(wn))
        .select(
            "doc_id",
            raw.cast("long").alias("n_sym_raw"),
            bpe.cast("long").alias("n_sym_bpe"),
        )
        .select(
            "doc_id",
            "n_sym_raw",
            "n_sym_bpe",
            F.round(
                F.col("n_sym_bpe").cast("double")
                / F.greatest(F.col("n_sym_raw"), F.lit(1)).cast("double"),
                6,
            ).alias("compression"),
        )
    )


_BPE_MARKER_BASE = 0xE000  # private-use area: never in meaningful text
_BPE_MAX_ROUNDS = 256


def bpe_learn_merges(docs: DataFrame, n_rounds: int = 4) -> list[dict]:
    """Full iterative BPE tokenizer TRAINING over the vocab table: N
    rounds of (count adjacent symbol pairs → argmax merge → re-segment),
    Sennrich et al. 2016's Algorithm 1 with the corpus-side count running
    distributed each round. Each learned merge collapses to ONE driver
    row per round (the merge table is the tokenizer artifact — index
    metadata exactly like the IVF centroids' k×dim collect, bounded by
    n_rounds, never data-sized); re-segmentation stays executor-side as a
    chained literal ``replace`` into per-merge marker chars, so symbol
    identity survives multi-char merges. Tie-break on (count desc,
    sym1, sym2) over DISPLAY strings, matching the serial reference
    implementation pinned in tests/test_textops.py.

    Returns [{left, right, merged, count}, ...] in merge order. Rounds 1
    and 2 agree with the oracle-checked e3_vocab_induction /
    e3_vocab_induction_2round argmaxes by construction.

    Symbol identity is the DISPLAY string (as in the serial algorithm,
    where a symbol is its text): when two merge paths produce the same
    display — e.g. ('ab','c') and ('a','bc') both yielding 'abc' — the
    later merge reuses the existing marker, so every occurrence of the
    symbol carries ONE encoding and later searches find all of them.
    Markers live in the Unicode private-use area (U+E000..) so they can
    never collide with real corpus characters (chr(1+r) would hit tab/
    newline at r=8/9); a corpus that itself contains PUA characters is
    rejected up front rather than silently corrupted."""
    if n_rounds > _BPE_MAX_ROUNDS:
        raise ValueError(f"n_rounds > {_BPE_MAX_ROUNDS} exceeds the marker alphabet")
    words = _vocab_words(docs).select(F.col("word").alias("w"), "n").persist()
    try:
        if words.filter(F.col("w").rlike("[-]")).take(1):
            raise ValueError(
                "corpus contains private-use-area characters that collide "
                "with BPE segmentation markers (U+E000-U+E0FF)"
            )
        markers: list[tuple[str, str]] = []  # (marker char, display string)
        inv: dict[str, str] = {}  # display -> marker
        merges: list[dict] = []
        cur = words
        for r in range(n_rounds):
            def disp(c):
                out = c
                for marker, display in markers:
                    out = F.when(c == marker, display).otherwise(out)
                return out

            pairs = cur.filter(F.length("w") >= 2).select(
                "n",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.length("w") - 1),
                        lambda i: F.struct(
                            F.col("w").substr(i, F.lit(1)).alias("c1"),
                            F.col("w").substr(i + 1, F.lit(1)).alias("c2"),
                        ),
                    )
                ).alias("p"),
            )
            top = (
                pairs.select(
                    "n",
                    disp(F.col("p.c1")).alias("sym1"),
                    disp(F.col("p.c2")).alias("sym2"),
                )
                .groupBy("sym1", "sym2")
                .agg(F.sum("n").alias("c"))
                .orderBy(F.desc("c"), F.asc("sym1"), F.asc("sym2"))
                .limit(1)
                .collect()  # 1 row: the learned merge (tokenizer metadata)
            )
            if not top:
                break
            sym1, sym2, cnt = top[0]["sym1"], top[0]["sym2"], top[0]["c"]
            merged = sym1 + sym2
            search = inv.get(sym1, sym1) + inv.get(sym2, sym2)
            marker = inv.get(merged)
            if marker is None:
                marker = chr(_BPE_MARKER_BASE + r)
                inv[merged] = marker
                markers.append((marker, merged))
            # else: a second merge path reached an existing display —
            # same symbol, same marker (serial-semantics unification)
            merges.append(
                {"left": sym1, "right": sym2, "merged": merged, "count": cnt}
            )
            cur = cur.withColumn(
                "w", F.replace(F.col("w"), F.lit(search), F.lit(marker))
            )
        return merges
    finally:
        words.unpersist()


BM25_K1 = 1.2
BM25_B = 0.75


def e3_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Robertson/Spärck Jones) over the document
    corpus for the fixed query ``SEARCH_TERMS`` — the OR-semantics,
    length-normalized complement to ``e3_ranked_search``'s AND+tf-idf:
    term-frequency SATURATION (k1) stops a term repeated 50× from scoring
    50×, and length normalization (b) stops long documents from winning
    on volume alone. score = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1−b +
    b·dl/avgdl)) with the BM25+ idf = ln(1 + (N−df+0.5)/(df+0.5)),
    k1 = 1.2, b = 0.75.

    Same inverted-index plan as e3_ranked_search: the exploded token
    stream is filtered to query-term survivors BEFORE its only shuffle
    (the posting-list groupBy), idf and the corpus length stats ride a
    2-row and a 1-row broadcast, and top-20 is TakeOrderedAndProject.
    avgdl enters as exact-integer sum_dl/n_docs inside one expression
    (b·dl·n_docs/sum_dl) so both engines evaluate the identical IEEE
    operation sequence; scores round to 6dp."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(_tokens(), lambda t: t != "").alias("toks"),
    )
    with_dl = docs.select("doc_id", F.explode("toks").alias("term"), F.size("toks").alias("dl"))
    postings = (
        with_dl.filter(F.col("term").isin(SEARCH_TERMS))
        .groupBy("doc_id", "term", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    totals = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("toks")).alias("sum_dl"),
    )
    contrib = (
        F.log(
            1.0
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        * (F.col("tf") * (BM25_K1 + 1.0))
        / (
            F.col("tf")
            + BM25_K1
            * (
                (1.0 - BM25_B)
                + BM25_B * F.col("dl") * F.col("n_docs") / F.col("sum_dl")
            )
        )
    )
    return (
        postings.join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


WINNOW_K = 3  # tokens per k-gram
WINNOW_W = 4  # k-gram hashes per selection window


def winnow_postings(docs: DataFrame) -> DataFrame:
    """(doc_id, fp) winnowing fingerprint postings of ``docs.text``
    (Schleimer/Wilkerson/Aiken 2003, the MOSS scheme): md5 every
    ``WINNOW_K``-token k-gram (the same portable, collision-resistant
    digest the span-dedup family keys on — an early per-token
    first-char×length code collapsed to ~6 distinct values on synthetic
    ``tokNNN`` corpora and flagged 75% of the stream-bench corpus as
    spurious dups), slide a ``WINNOW_W``-wide window over the digest
    sequence, and keep each window's LEXICOGRAPHIC minimum (order is
    engine-independent: both engines emit lowercase hex). The guarantee:
    any shared run of ``WINNOW_K + WINNOW_W - 1`` tokens yields at least
    one shared fingerprint, with ~2/(W+1) of positions selected — a
    tunable document sketch for containment-style near-dup detection.
    Short docs degrade gracefully: fewer digests than a window selects
    the overall minimum (one fingerprint); fewer tokens than a k-gram
    selects nothing.

    Each stage (tokens → k-gram digests → window minima) is materialized
    as its OWN projection: Spark does not common-subexpression-eliminate
    inside higher-order-function lambdas, so an inlined ``hashes`` array
    would be rebuilt per window position — O(n²)-per-doc and a 30×
    slowdown measured at sf0.001. Across Project boundaries each array is
    computed once per row and referenced thereafter. All array-local, no
    shuffle, no Python.

    The explode's generator must stay the INLINE expression, never a
    previously-aliased array column (round-10 design record): exploding
    an aliased array lets Catalyst's InferFiltersFromGenerate add
    ``size(arr) > 0`` above the projection chain, and predicate pushdown
    then substitutes the alias — inlining the ENTIRE winnowing pipeline
    into a per-row Filter whose lambdas re-split the text per element,
    the exact O(n²) CSE trap the paragraph above describes reintroduced
    by the optimizer (measured: a 2×-replicated sf0.1 corpus went from
    2.1 s to >100 s). An explode_outer + isNotNull detour dodges that
    rule but still measured ~20% slower at the 50× stress corpus than
    this inline form (128 vs 103 s), so the aliased-array stage the
    rejected bitmap prune needed is gone with it."""
    staged = docs.select("doc_id", _tokens().alias("toks"))
    t = F.col("toks")
    n = F.size(t)
    kidx = F.when(
        n >= WINNOW_K, F.sequence(F.lit(1), n - (WINNOW_K - 1))
    ).otherwise(F.array().cast("array<int>"))
    hashes = F.transform(
        kidx,
        lambda i: F.md5(
            F.concat_ws(
                " ",
                F.element_at(t, i),
                F.element_at(t, i + 1),
                F.element_at(t, i + 2),
            )
        ),
    )
    staged = staged.select("doc_id", hashes.alias("hashes"))
    h = F.col("hashes")
    nh = F.size(h)
    widx = F.when(
        nh >= 1,
        F.sequence(F.lit(1), F.greatest(F.lit(1), nh - (WINNOW_W - 1))),
    ).otherwise(F.array().cast("array<int>"))
    selected = F.array_distinct(
        F.transform(widx, lambda j: F.array_min(F.slice(h, j, WINNOW_W)))
    )
    return staged.select("doc_id", F.explode(selected).alias("fp"))


def e3_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document winnowing fingerprint postings (doc_id, fp) — the
    document-sketch table a fingerprint-based near-dup index
    (``e1_winnow_join``, dedup.py) probes. One narrow scan, fingerprints
    computed array-locally inside codegen, exploded to posting rows; at
    100 TB the postings are written bucketed by fp like any inverted
    index."""
    return winnow_postings(load_table(spark, sf_dir, "documents"))


def e3_ngram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model quality scoring (the CCNet/KenLM-style
    perplexity filter, re-expressed relationally): train an add-one-
    smoothed bigram LM on the corpus itself — P(w2|w1) = (c(w1 w2) + 1) /
    (c(w1·) + V) — then score each document by its mean token-transition
    log-probability. Low scores flag rare/garbled text, implausibly high
    ones boilerplate; corpus pipelines bucket on exactly this signal.

    Parity discipline (same reason ``e3_trigram_familiarity`` is integer):
    a float SUM over hundreds of bigrams accumulates engine-order ULPs, so
    each bigram's log-prob is rounded to an INTEGER micro-log first
    (round(1e6·ln p) — ln's own error is ~1e-9 of a micro-unit, so the
    integer is engine-exact) and per-doc sums/averages are exact integer
    arithmetic over those.

    Shape at 100 TB: one explode + groupBy builds the bigram model (Zipf-
    bounded, ≪ corpus), a second counts contexts; scoring is an equi-join
    of doc bigrams against the model — broadcast when the LM fits, shuffle
    hash join with AQE skew-split otherwise (hot function words are the
    skew keys)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    n = F.size(toks)
    bidx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    bigrams = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                bidx,
                lambda i: F.struct(
                    F.element_at(toks, i).alias("w1"),
                    F.element_at(toks, i + 1).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    model = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_bg"))
    # c(w1·) = Σ_w2 c(w1 w2): the context counts are a roll-up of the
    # model itself — same integers as re-counting the bigram stream, one
    # corpus tokenize+explode pass fewer (round 13; the model is the
    # Zipf-bounded small side, so the window runs over model rows, not
    # the corpus). Fused onto the model row so the probe side joins ONCE.
    w_ctx = Window.partitionBy("w1")
    model = model.withColumn("n_ctx", F.sum("n_bg").over(w_ctx))
    vocab = docs.select(F.explode(toks).alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    logp_micro = F.round(
        F.log(
            (F.col("n_bg") + 1).cast("double")
            / (F.col("n_ctx") + F.col("v")).cast("double")
        )
        * 1_000_000.0,
        0,
    ).cast("bigint")
    return (
        bigrams.join(model, ["w1", "w2"])
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(logp_micro).alias("sum_logp_micro"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "sum_logp_micro",
            F.round(
                F.col("sum_logp_micro").cast("double") / F.col("n_bigrams"),
                4,
            ).alias("avg_logp_micro"),
        )
    )


def e3_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020): per source,
    documents are ranked by their LM score (e3_ngram_lm_score — the
    bigram stand-in for KenLM perplexity) and cut into TERCILES;
    downstream consumers keep "head" (most fluent third), sample
    "middle", and usually drop "tail". This is the selection step CCNet
    runs per language bucket; ``source`` plays the language role on
    this corpus. Deterministic total order (score desc, doc_id asc) so
    ntile is engine-exact; docs with < 2 tokens carry no bigrams and —
    exactly like the LM scorer — fall outside the ranked population.

    Scale: ntile needs the per-source population in one task, the same
    caveat e3_zscore_by_source documents; the skew-proof rewrite is the
    histogram-CDF + bucketed-positions decomposition already coded in
    e5_curriculum_order_scaled (quartiles there, terciles here — the
    identical algebra), so the straggler-free form exists and this
    entry keeps the literal CCNet shape."""
    scored = e3_ngram_lm_score(spark, sf_dir).select(
        "doc_id", "avg_logp_micro"
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(
        F.desc("avg_logp_micro"), F.asc("doc_id")
    )
    tercile = F.ntile(3).over(w)
    return (
        scored.join(docs, "doc_id")
        .select(
            "doc_id",
            "source",
            "avg_logp_micro",
            tercile.alias("tercile"),
        )
        .withColumn(
            "bucket",
            F.element_at(
                F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
                F.col("tercile"),
            ),
        )
    )


def e3_doc_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram Shannon entropy — the lexical-diversity
    quality signal (low entropy ≈ repetitive/boilerplate text, the same
    family as the Gopher repetition rules but distribution-level):
    H = Σ_w (c_w/n)·ln(n/c_w) over the document's own word distribution.

    Parity discipline: each distinct word's contribution is rounded to an
    INTEGER micro-nat before the per-doc sum (ln's engine error is ~1e-9
    of a micro-unit, so every term is engine-exact and the sum is exact
    integer arithmetic — same reasoning as e3_ngram_lm_score). Shape: one
    explode + (doc, word) groupBy (map-side combinable, bounded by doc
    vocabulary), a doc-level roll-up, one join back on doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(F.filter(_tokens(), lambda t: t != "")).alias("w"),
    )
    wc = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    per_doc = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_distinct")
    )
    term_micro = F.round(
        (F.col("c").cast("double") / F.col("n").cast("double"))
        * F.log(F.col("n").cast("double") / F.col("c").cast("double"))
        * 1_000_000.0,
        0,
    ).cast("bigint")
    return (
        wc.join(per_doc, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.max("n").alias("n_tokens"),
            F.max("n_distinct").alias("n_distinct"),
            F.sum(term_micro).alias("entropy_micro"),
        )
    )


def e3_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling weights (DSIR, Xie et al.
    2023): per-document log importance ratio between a TARGET unigram
    distribution (here the lang='en' subcorpus — the domain being
    selected FOR) and the RAW corpus distribution,
    w(doc) = Σ_tokens ln( p_target(w) / p_raw(w) ), add-one smoothed over
    the shared vocabulary. High-weight documents look like the target
    domain and get preferentially resampled into the training mixture —
    the importance-sampling complement of the hard filters (gopher rules,
    LM score).

    Parity discipline: each token's ratio is ONE ln of an exact integer
    rational ((c_t+1)(n_raw+V)) / ((c_r+1)(n_t+V)) — both engines form
    the identical double, so the micro-rounded integer terms and their
    per-doc sums are engine-exact. Shape: the raw unigram model is one
    explode + groupBy (Zipf-bounded), the target model a filtered second
    aggregate of the same exploded frame, scoring is an equi-join on the
    word (broadcastable lexicon at real scale) + a broadcast totals row."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        "lang",
        F.explode(F.filter(_tokens(), lambda t: t != "")).alias("w"),
    )
    raw = words.groupBy("w").agg(F.count(F.lit(1)).alias("c_raw"))
    tgt = (
        words.filter(F.col("lang") == "en")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_tgt"))
    )
    model = raw.join(tgt, "w", "left").na.fill({"c_tgt": 0})
    totals = model.agg(
        F.sum("c_raw").alias("n_raw"),
        F.sum("c_tgt").alias("n_tgt"),
        F.count(F.lit(1)).alias("v"),
    )
    term_micro = F.round(
        F.log(
            ((F.col("c_tgt") + 1) * (F.col("n_raw") + F.col("v"))).cast(
                "double"
            )
            / ((F.col("c_raw") + 1) * (F.col("n_tgt") + F.col("v"))).cast(
                "double"
            )
        )
        * 1_000_000.0,
        0,
    ).cast("bigint")
    return (
        words.join(model, "w")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(term_micro).alias("dsir_micro"),
        )
    )


QUERIES = {
    "e3_token_count": e3_token_count,
    "e3_doc_entropy": e3_doc_entropy,
    "e3_dsir_weights": e3_dsir_weights,
    "e3_repetition_ratio": e3_repetition_ratio,
    "e3_quality_score": e3_quality_score,
    "e3_language_id": e3_language_id,
    "e3_doc_fingerprint": e3_doc_fingerprint,
    "e3_tfidf_term": e3_tfidf_term,
    "e3_bpe_tokens": e3_bpe_tokens,
    "e3_ranked_search": e3_ranked_search,
    "e3_bm25_search": e3_bm25_search,
    "e3_vocab_induction": e3_vocab_induction,
    "e3_vocab_induction_2round": e3_vocab_induction_2round,
    "e3_bpe_encode": e3_bpe_encode,
    "e3_bpe_encode_nround": e3_bpe_encode_nround,
    "e3_trigram_familiarity": e3_trigram_familiarity,
    "e3_winnow_fingerprints": e3_winnow_fingerprints,
    "e3_ngram_lm_score": e3_ngram_lm_score,
    "e3_ccnet_buckets": e3_ccnet_buckets,
}

# Winnowing postings as a reusable oracle CTE (k=3 token k-grams keyed by
# md5 — both engines emit lowercase hex, so the window-min's lexicographic
# order is engine-independent; w=4 windows realized as a SQL window-min
# over full windows only — `i <= greatest(1, nh - 3)` reproduces Spark's
# slice truncation for docs shorter than one window).
WINNOW_POSTINGS_CTE = """
        toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ), hashes AS (
            SELECT doc_id, s.i AS i, len(t) - 2 AS nh,
                   md5(t[s.i] || ' ' || t[s.i + 1] || ' ' || t[s.i + 2]) AS h
            FROM toks,
                 LATERAL unnest(generate_series(1, len(t) - 2)) AS s(i)
            WHERE len(t) >= 3
        ), wins AS (
            SELECT doc_id, i, nh,
                   min(h) OVER (PARTITION BY doc_id ORDER BY i
                                ROWS BETWEEN CURRENT ROW
                                AND 3 FOLLOWING) AS fp
            FROM hashes
        ), winnow_postings AS (
            SELECT DISTINCT doc_id, fp
            FROM wins WHERE i <= greatest(1, nh - 3)
        )
"""

ORACLES = {
    "e3_vocab_induction": """
        WITH words AS (
            SELECT t.w AS word, count(*) AS n
            FROM documents,
                 LATERAL unnest(list_filter(string_split(text, ' '),
                                            x -> x <> '')) AS t(w)
            GROUP BY t.w
        ), pairs AS (
            SELECT substr(word, i, 2) AS pair, n
            FROM words, LATERAL unnest(generate_series(1, len(word) - 1)) AS s(i)
            WHERE len(word) >= 2
        )
        SELECT pair, CAST(sum(n) AS BIGINT) AS pair_count
        FROM pairs GROUP BY pair
        ORDER BY pair_count DESC, pair ASC
        LIMIT 20
    """,
    "e3_vocab_induction_2round": """
        WITH words AS (
            SELECT t.w AS word, count(*) AS n
            FROM documents,
                 LATERAL unnest(list_filter(string_split(text, ' '),
                                            x -> x <> '')) AS t(w)
            GROUP BY t.w
        ), p1 AS (
            SELECT substr(word, i, 2) AS pair, sum(n) AS c
            FROM words,
                 LATERAL unnest(generate_series(1, len(word) - 1)) AS s(i)
            WHERE len(word) >= 2
            GROUP BY substr(word, i, 2)
        ), winner AS (
            SELECT pair AS merge1 FROM p1 ORDER BY c DESC, pair ASC LIMIT 1
        ), seg AS (
            SELECT n, merge1, replace(word, merge1, chr(1)) AS w
            FROM words, winner
        ), p2 AS (
            SELECT n, merge1,
                   substr(w, i, 1) AS c1, substr(w, i + 1, 1) AS c2
            FROM seg,
                 LATERAL unnest(generate_series(1, len(w) - 1)) AS s(i)
            WHERE len(w) >= 2
        )
        SELECT merge1,
               CASE WHEN c1 = chr(1) THEN merge1 ELSE c1 END AS sym1,
               CASE WHEN c2 = chr(1) THEN merge1 ELSE c2 END AS sym2,
               CAST(sum(n) AS BIGINT) AS pair_count
        FROM p2
        GROUP BY merge1, sym1, sym2
        ORDER BY pair_count DESC, sym1 ASC, sym2 ASC
        LIMIT 20
    """,
    "e3_bpe_encode": """
        WITH words AS (
            SELECT t.w AS word, count(*) AS n
            FROM documents,
                 LATERAL unnest(list_filter(string_split(text, ' '),
                                            x -> x <> '')) AS t(w)
            GROUP BY t.w
        ), p1 AS (
            SELECT substr(word, i, 2) AS pair, sum(n) AS c
            FROM words,
                 LATERAL unnest(generate_series(1, len(word) - 1)) AS s(i)
            WHERE len(word) >= 2
            GROUP BY substr(word, i, 2)
        ), winner AS (
            SELECT pair AS merge1 FROM p1 ORDER BY c DESC, pair ASC LIMIT 1
        ), seg AS (
            SELECT n, merge1, replace(word, merge1, chr(1)) AS w
            FROM words, winner
        ), p2 AS (
            SELECT merge1, substr(w, i, 2) AS pair2, sum(n) AS c
            FROM seg,
                 LATERAL unnest(generate_series(1, len(w) - 1)) AS s(i)
            WHERE len(w) >= 2
            GROUP BY merge1, substr(w, i, 2)
        ), winner2 AS (
            SELECT merge1, pair2 AS merge2
            FROM p2 ORDER BY c DESC, pair2 ASC LIMIT 1
        ), d AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM documents
        ), counts AS (
            SELECT doc_id,
                   CAST(coalesce(list_aggregate(
                       list_transform(toks, w -> len(w)), 'sum'), 0)
                       AS BIGINT) AS n_sym_raw,
                   CAST(coalesce(list_aggregate(
                       list_transform(toks, w -> len(
                           replace(replace(w, merge1, chr(1)),
                                   merge2, chr(2)))), 'sum'), 0)
                       AS BIGINT) AS n_sym_bpe
            FROM d, winner2
        )
        SELECT doc_id, n_sym_raw, n_sym_bpe,
               round(CAST(n_sym_bpe AS DOUBLE)
                     / CAST(greatest(n_sym_raw, 1) AS DOUBLE), 6)
                   AS compression
        FROM counts
    """,
    # 4-round BPE: each round's CTE pair (p_r: adjacent single-char pair
    # counts over the marker-segmented vocab; m_r: argmax with the
    # DISPLAY-order tie-break, display = markers chr(1..3) expanded via
    # CASE) mirrors _nround_winner's unrolled loop exactly; the encoder
    # applies the 4 searches as a replace chain over raw text (searches
    # never contain spaces, so whole-text == per-token replacement).
    "e3_bpe_encode_nround": """
        WITH words0 AS (
            SELECT t.w AS w, count(*) AS n
            FROM documents,
                 LATERAL unnest(list_filter(string_split(text, ' '),
                                            x -> x <> '')) AS t(w)
            GROUP BY t.w
        ), p1 AS (
            SELECT substr(w, i, 1) AS c1, substr(w, i + 1, 1) AS c2,
                   sum(n) AS c
            FROM words0,
                 LATERAL unnest(generate_series(1, len(w) - 1)) AS s(i)
            WHERE len(w) >= 2 GROUP BY c1, c2
        ), m1 AS (
            SELECT c1 || c2 AS s1, c1 || c2 AS d1
            FROM p1 ORDER BY c DESC, c1 ASC, c2 ASC LIMIT 1
        ), words1 AS (
            SELECT replace(w, (SELECT s1 FROM m1), chr(1)) AS w, n
            FROM words0
        ), p2 AS (
            SELECT substr(w, i, 1) AS c1, substr(w, i + 1, 1) AS c2,
                   sum(n) AS c
            FROM words1,
                 LATERAL unnest(generate_series(1, len(w) - 1)) AS s(i)
            WHERE len(w) >= 2 GROUP BY c1, c2
        ), m2 AS (
            SELECT c1 || c2 AS s2,
                   (CASE WHEN c1 = chr(1) THEN (SELECT d1 FROM m1)
                         ELSE c1 END)
                   || (CASE WHEN c2 = chr(1) THEN (SELECT d1 FROM m1)
                            ELSE c2 END) AS d2
            FROM p2
            ORDER BY c DESC,
                CASE WHEN c1 = chr(1) THEN (SELECT d1 FROM m1)
                     ELSE c1 END ASC,
                CASE WHEN c2 = chr(1) THEN (SELECT d1 FROM m1)
                     ELSE c2 END ASC
            LIMIT 1
        ), words2 AS (
            SELECT replace(w, (SELECT s2 FROM m2), chr(2)) AS w, n
            FROM words1
        ), p3 AS (
            SELECT substr(w, i, 1) AS c1, substr(w, i + 1, 1) AS c2,
                   sum(n) AS c
            FROM words2,
                 LATERAL unnest(generate_series(1, len(w) - 1)) AS s(i)
            WHERE len(w) >= 2 GROUP BY c1, c2
        ), m3 AS (
            SELECT c1 || c2 AS s3,
                   (CASE WHEN c1 = chr(1) THEN (SELECT d1 FROM m1)
                         WHEN c1 = chr(2) THEN (SELECT d2 FROM m2)
                         ELSE c1 END)
                   || (CASE WHEN c2 = chr(1) THEN (SELECT d1 FROM m1)
                            WHEN c2 = chr(2) THEN (SELECT d2 FROM m2)
                            ELSE c2 END) AS d3
            FROM p3
            ORDER BY c DESC,
                CASE WHEN c1 = chr(1) THEN (SELECT d1 FROM m1)
                     WHEN c1 = chr(2) THEN (SELECT d2 FROM m2)
                     ELSE c1 END ASC,
                CASE WHEN c2 = chr(1) THEN (SELECT d1 FROM m1)
                     WHEN c2 = chr(2) THEN (SELECT d2 FROM m2)
                     ELSE c2 END ASC
            LIMIT 1
        ), words3 AS (
            SELECT replace(w, (SELECT s3 FROM m3), chr(3)) AS w, n
            FROM words2
        ), p4 AS (
            SELECT substr(w, i, 1) AS c1, substr(w, i + 1, 1) AS c2,
                   sum(n) AS c
            FROM words3,
                 LATERAL unnest(generate_series(1, len(w) - 1)) AS s(i)
            WHERE len(w) >= 2 GROUP BY c1, c2
        ), m4 AS (
            SELECT c1 || c2 AS s4
            FROM p4
            ORDER BY c DESC,
                CASE WHEN c1 = chr(1) THEN (SELECT d1 FROM m1)
                     WHEN c1 = chr(2) THEN (SELECT d2 FROM m2)
                     WHEN c1 = chr(3) THEN (SELECT d3 FROM m3)
                     ELSE c1 END ASC,
                CASE WHEN c2 = chr(1) THEN (SELECT d1 FROM m1)
                     WHEN c2 = chr(2) THEN (SELECT d2 FROM m2)
                     WHEN c2 = chr(3) THEN (SELECT d3 FROM m3)
                     ELSE c2 END ASC
            LIMIT 1
        ), enc AS (
            SELECT doc_id,
                   len(replace(text, ' ', '')) AS n_sym_raw,
                   len(replace(replace(replace(replace(replace(text,
                       (SELECT s1 FROM m1), chr(1)),
                       (SELECT s2 FROM m2), chr(2)),
                       (SELECT s3 FROM m3), chr(3)),
                       (SELECT s4 FROM m4), chr(4)), ' ', '')) AS n_sym_bpe
            FROM documents
        )
        SELECT doc_id,
               CAST(n_sym_raw AS BIGINT) AS n_sym_raw,
               CAST(n_sym_bpe AS BIGINT) AS n_sym_bpe,
               round(CAST(n_sym_bpe AS DOUBLE)
                     / CAST(greatest(n_sym_raw, 1) AS DOUBLE), 6)
                   AS compression
        FROM enc
    """,
    "e3_bm25_search": """
        WITH d AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS toks
            FROM documents
        ), wdl AS (
            SELECT doc_id, len(toks) AS dl, t.term
            FROM d, LATERAL unnest(toks) AS t(term)
        ), postings AS (
            SELECT doc_id, term, dl, count(*) AS tf
            FROM wdl WHERE term IN ('scan', 'agg')
            GROUP BY doc_id, term, dl
        ), idf AS (
            SELECT term, count(*) AS df FROM postings GROUP BY term
        ), totals AS (
            SELECT count(*) AS n_docs, sum(len(toks)) AS sum_dl FROM d
        )
        SELECT doc_id,
               round(sum(
                   ln(CAST(1 AS DOUBLE)
                      + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE)
                         + CAST(0.5 AS DOUBLE))
                        / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
                   * (CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
                   / (CAST(tf AS DOUBLE)
                      + CAST(1.2 AS DOUBLE)
                        * (CAST(0.25 AS DOUBLE)
                           + CAST(0.75 AS DOUBLE) * CAST(dl AS DOUBLE)
                             * CAST(n_docs AS DOUBLE) / CAST(sum_dl AS DOUBLE)))
               ), 6) AS score
        FROM postings JOIN idf USING (term) CROSS JOIN totals
        GROUP BY doc_id
        ORDER BY score DESC, doc_id ASC
        LIMIT 20
    """,
    "e3_trigram_familiarity": """
        WITH t AS (
            SELECT doc_id, lang, string_split(text, ' ') AS toks
            FROM documents
        ), exploded AS (
            SELECT doc_id, lang, unnest(
                list_transform(range(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
            ) AS trigram
            FROM t
        ), lm AS (
            SELECT trigram, count(*) AS corpus_count
            FROM exploded GROUP BY trigram
        )
        SELECT e.doc_id, e.lang,
               count(*) AS n_trigrams,
               CAST(sum(lm.corpus_count) AS BIGINT) AS sum_counts,
               (2 * CAST(sum(lm.corpus_count) AS BIGINT) * 1000 + count(*))
                   // (2 * count(*)) AS fam_milli
        FROM exploded e JOIN lm USING (trigram)
        GROUP BY e.doc_id, e.lang
    """,
    "e3_repetition_ratio": """
        WITH t AS (
            SELECT doc_id, lang, string_split(text, ' ') AS toks
            FROM documents
        ), tri AS (
            SELECT doc_id, lang,
                   list_transform(range(1, len(toks) - 1),
                                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                       AS tri
            FROM t
        )
        SELECT doc_id, lang,
               CAST(len(tri) AS INT) AS n_trigrams,
               CAST(len(list_distinct(tri)) AS INT) AS n_distinct,
               round(1.0 - len(list_distinct(tri)) / CAST(len(tri) AS DOUBLE), 6)
                   AS repetition_ratio
        FROM tri
    """,
    "e3_token_count": """
        WITH t AS (
            SELECT lang, source, len(string_split(text, ' ')) AS n_tokens
            FROM documents
        )
        SELECT lang, source, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               round(avg(n_tokens), 4) AS avg_tokens
        FROM t GROUP BY lang, source
    """,
    "e3_quality_score": """
        WITH t AS (
            SELECT doc_id, text, string_split(text, ' ') AS toks,
                   len(string_split(text, ' ')) AS n_tokens
            FROM documents
        ), m AS (
            SELECT doc_id, n_tokens,
                   CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to'))) AS DOUBLE)
                     / n_tokens AS stop_ratio,
                   CAST(length(text) - (n_tokens - 1) AS DOUBLE) / n_tokens AS avg_tok_len
            FROM t
        )
        SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
               round(stop_ratio, 6) AS stopword_ratio,
               round(avg_tok_len, 6) AS avg_token_len,
               round(0.5 * least(n_tokens / 100.0, 1.0)
                     + 0.3 * (1.0 - stop_ratio)
                     + 0.2 * least(avg_tok_len / 10.0, 1.0), 6) AS quality_score
        FROM m
    """,
    "e3_language_id": """
        WITH g AS (
            SELECT lang AS true_lang,
                   CASE WHEN list_contains(string_split(text, ' '), 'der') THEN 'de'
                        WHEN list_contains(string_split(text, ' '), 'le') THEN 'fr'
                        WHEN list_contains(string_split(text, ' '), 'el') THEN 'es'
                        WHEN list_contains(string_split(text, ' '), 'shi') THEN 'zh'
                        ELSE 'en' END AS guessed_lang
            FROM documents
        )
        SELECT true_lang, guessed_lang, count(*) AS n_docs
        FROM g GROUP BY true_lang, guessed_lang
    """,
    "e3_doc_fingerprint": """
        WITH t AS (
            SELECT doc_id,
                   list_transform(string_split(text, ' '),
                                  x -> CAST(ascii(x) AS BIGINT) * 31 + CAST(length(x) AS BIGINT))
                     AS codes
            FROM documents
        )
        SELECT doc_id,
               list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
                           (acc, x) -> (acc * 131 + x) % 1000000007) AS fingerprint
        FROM t
    """,
    "e3_tfidf_term": """
        WITH per_doc AS (
            SELECT doc_id,
                   CAST(len(list_filter(string_split(text, ' '), x -> x = 'spark')) AS INT) AS tf
            FROM documents
        ), stats AS (
            SELECT count(*) AS n_docs_total,
                   count(CASE WHEN tf > 0 THEN 1 END) AS df
            FROM per_doc
        )
        SELECT doc_id, tf,
               round(tf * ln(CAST(n_docs_total AS DOUBLE) / df), 6) AS tfidf
        FROM per_doc, stats
        WHERE tf > 0
    """,
    "e3_ranked_search": """
        WITH postings AS (
            SELECT doc_id, term, count(*) AS tf
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                  FROM documents)
            WHERE term IN ('scan', 'agg')
            GROUP BY doc_id, term
        ), idf AS (
            SELECT term, count(*) AS df FROM postings GROUP BY term
        ), totals AS (
            SELECT count(*) AS n_docs_total FROM documents
        ), scored AS (
            SELECT doc_id,
                   count(DISTINCT p.term) AS n_terms,
                   round(sum(p.tf * ln(CAST(n_docs_total AS DOUBLE) / df)), 6)
                       AS score
            FROM postings p JOIN idf USING (term), totals
            GROUP BY doc_id
        )
        SELECT doc_id, score FROM scored
        WHERE n_terms = 2
        ORDER BY score DESC, doc_id ASC LIMIT 20
    """,
    "e3_bpe_tokens": """
        SELECT doc_id, lang,
               len(regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s])'))
                   AS n_pieces,
               len(string_split(text, ' ')) AS n_ws_tokens,
               CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens
        FROM documents
    """,
    "e3_winnow_fingerprints": f"""
        WITH {WINNOW_POSTINGS_CTE}
        SELECT doc_id, fp FROM winnow_postings
    """,
    "e3_dsir_weights": """
        WITH words AS (
            SELECT doc_id, lang, u.w AS w
            FROM documents,
                 LATERAL unnest(list_filter(string_split(text, ' '),
                                            x -> x <> '')) AS u(w)
        ), raw AS (
            SELECT w, count(*) AS c_raw FROM words GROUP BY w
        ), tgt AS (
            SELECT w, count(*) AS c_tgt FROM words
            WHERE lang = 'en' GROUP BY w
        ), model AS (
            SELECT raw.w, c_raw, coalesce(c_tgt, 0) AS c_tgt
            FROM raw LEFT JOIN tgt ON raw.w = tgt.w
        ), totals AS (
            SELECT sum(c_raw) AS n_raw, sum(c_tgt) AS n_tgt,
                   count(*) AS v
            FROM model
        )
        SELECT doc_id, lang,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(CAST(round(
                   ln(CAST((c_tgt + 1) * (n_raw + v) AS DOUBLE)
                      / CAST((c_raw + 1) * (n_tgt + v) AS DOUBLE))
                   * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS dsir_micro
        FROM words JOIN model USING (w), totals
        GROUP BY doc_id, lang
    """,
    "e3_doc_entropy": """
        WITH words AS (
            SELECT doc_id, u.w AS w
            FROM documents,
                 LATERAL unnest(list_filter(string_split(text, ' '),
                                            x -> x <> '')) AS u(w)
        ), wc AS (
            SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w
        ), per_doc AS (
            SELECT doc_id, sum(c) AS n, count(*) AS n_distinct
            FROM wc GROUP BY doc_id
        )
        SELECT wc.doc_id,
               CAST(max(n) AS BIGINT) AS n_tokens,
               CAST(max(n_distinct) AS BIGINT) AS n_distinct,
               CAST(sum(CAST(round(
                   (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                   * ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE))
                   * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS entropy_micro
        FROM wc JOIN per_doc USING (doc_id)
        GROUP BY wc.doc_id
    """,
    "e3_ngram_lm_score": """
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ), bg AS (
            SELECT doc_id, t[s.i] AS w1, t[s.i + 1] AS w2
            FROM toks,
                 LATERAL unnest(generate_series(1, len(t) - 1)) AS s(i)
            WHERE len(t) >= 2
        ), model AS (
            SELECT w1, w2, count(*) AS n_bg FROM bg GROUP BY w1, w2
        ), ctx AS (
            SELECT w1, count(*) AS n_ctx FROM bg GROUP BY w1
        ), vocab AS (
            SELECT count(DISTINCT u.w) AS v
            FROM toks, LATERAL unnest(t) AS u(w)
        ), scored AS (
            SELECT b.doc_id,
                   CAST(round(
                       ln(CAST(m.n_bg + 1 AS DOUBLE)
                          / CAST(c.n_ctx + v.v AS DOUBLE)) * 1000000.0,
                       0) AS BIGINT) AS logp_micro
            FROM bg b JOIN model m USING (w1, w2) JOIN ctx c USING (w1),
                 vocab v
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(logp_micro) AS BIGINT) AS sum_logp_micro,
               round(CAST(sum(logp_micro) AS DOUBLE) / count(*), 4)
                   AS avg_logp_micro
        FROM scored GROUP BY doc_id
    """,
}


ORACLES["e3_ccnet_buckets"] = f"""
    WITH scored AS ({ORACLES["e3_ngram_lm_score"]})
    SELECT doc_id, source, avg_logp_micro,
           CAST(tercile AS INT) AS tercile,
           CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM (
        SELECT s.doc_id, d.source, s.avg_logp_micro,
               ntile(3) OVER (PARTITION BY d.source
                              ORDER BY s.avg_logp_micro DESC,
                                       s.doc_id ASC) AS tercile
        FROM scored s JOIN documents d ON s.doc_id = d.doc_id)
"""
