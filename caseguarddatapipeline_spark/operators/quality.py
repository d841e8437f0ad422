"""Corpus-hygiene operators for the training-data pipeline: a published
rule-battery quality filter (Gopher-style per-rule flags rather than one
blended score), a deterministic text canonicalization pass, a seeded
global shuffle that assigns training shards reproducibly, and
gaps-and-islands activity analysis over the event stream.

Reference parity: the reference scores document quality while extracting
text (docproc/extractor.py:210-240 quality_score on extraction output) and
filters admissible documents by size/format (docproc/format_config.py:86-145);
these operators generalize that into the rule-battery / canonicalize /
shuffle-shard stages a 100 TB pretraining corpus build needs. All four are
pure DataFrame algebra — no Python rows, no collects — so they inherit
whole-stage codegen and scale with the cluster.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources import load_table
from .textops import STOPWORDS

# Rule thresholds sit inside the synthetic corpus' observed spread
# (n_words 10-99, distinct-ratio 0.28-0.72 at sf0.01) so every rule
# discriminates; at a real corpus these become tenant config (the same
# pattern config.py uses for canonical fields).
MIN_WORDS, MAX_WORDS = 20, 90
MIN_MEAN_WLEN, MAX_MEAN_WLEN = 4.0, 4.9
MIN_DISTINCT_RATIO = 0.45
N_SHARDS = 8
SHUFFLE_SEED = "seed42:"


def e3_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-battery quality filter (Gopher/C4 style): each document gets a
    boolean per rule plus the conjunction, so downstream curation can
    report WHICH rule rejected a document (e5_curation_funnel composes
    per-stage counts the same way). Unlike e3_quality_score's blended
    scalar, the battery is auditable — the form production corpus filters
    take (Rae et al. 2021 §A1.1, public).

    One scan, one projection — every rule is column algebra over the
    split-once token array, so the whole battery runs inside one
    codegen stage and the scan reads only (doc_id, text)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_words = F.size(toks)
    # single-space tokenization ⇒ mean word length is arithmetic, no loop
    mean_wlen = (F.length("text") - (n_words - 1)).cast("double") / n_words
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_words
    ok_n_words = (n_words >= MIN_WORDS) & (n_words <= MAX_WORDS)
    ok_mean_wlen = (mean_wlen >= MIN_MEAN_WLEN) & (mean_wlen <= MAX_MEAN_WLEN)
    ok_distinct = distinct_ratio >= MIN_DISTINCT_RATIO
    ok_stopword = F.arrays_overlap(toks, F.array(*[F.lit(s) for s in STOPWORDS]))
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_wlen, 4).alias("mean_word_len"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        ok_n_words.alias("ok_n_words"),
        ok_mean_wlen.alias("ok_mean_word_len"),
        ok_distinct.alias("ok_distinct_ratio"),
        ok_stopword.alias("ok_stopword"),
        (ok_n_words & ok_mean_wlen & ok_distinct & ok_stopword).alias("passed"),
    )


def e3_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization pass: lowercase, trim, collapse runs of whitespace
    (space/tab) to single spaces — the normalization that runs before
    exact dedup so byte-identical-modulo-whitespace documents collapse to
    one content key (e1_exact_dedup hashes the canonical form in a real
    corpus build).

    The synthetic corpus is already single-spaced, so the query first
    derives a DETERMINISTIC messy variant per doc_id (padding, tabs,
    uppercasing, doubled spaces — the classes of noise web text carries)
    and then normalizes it; the oracle applies the identical derivation,
    making the round-trip exactly checkable. ``norm_key`` md5s the
    canonical text (md5 is bit-identical across engines, unlike
    xxhash64 — FIXTURES.md §D)."""
    docs = load_table(spark, sf_dir, "documents")
    mode = F.pmod(F.col("doc_id"), F.lit(3))
    messy = (
        F.when(mode == 0, F.concat(F.lit("  "), F.regexp_replace("text", " ", "   ")))
        .when(mode == 1, F.concat(F.upper(F.col("text")), F.lit("\t\t")))
        .otherwise(F.concat(F.lit("\t "), F.col("text"), F.lit("  ")))
    )
    norm = F.lower(F.trim(F.regexp_replace(messy, r"[ \t]+", " ")))
    return docs.select(
        "doc_id",
        F.length(messy).alias("raw_len"),
        F.length(norm).alias("norm_len"),
        F.md5(norm).alias("norm_key"),
        (norm == F.col("text")).alias("roundtrips"),
    )


def e5_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic global shuffle → training-shard assignment:
    order documents by md5(seed ‖ doc_id), cut the order into N_SHARDS
    equal shards (ntile), number positions within each shard. Reproducible
    across runs/engines because the permutation is a pure function of
    (seed, doc_id) — the property a training job needs to resume mid-epoch.

    Scale path: ntile's single global sort is exactly what
    ``repartitionByRange(N, key).sortWithinPartitions(key)`` distributes —
    range boundaries come from sampling, each shard materializes as one
    partition, and position-in-shard is a partition-local zipWithIndex;
    no stage ever holds the global order on one node. The ntile form here
    keeps the oracle exact; the range form is the 100 TB deployment and
    differs only at shard boundaries (sampled vs exact quantiles)."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "source",
        F.md5(F.concat(F.lit(SHUFFLE_SEED), F.col("doc_id").cast("string"))).alias(
            "order_key"
        ),
    )
    sharded = keyed.select(
        "doc_id",
        "source",
        "order_key",
        F.ntile(N_SHARDS).over(Window.orderBy("order_key")).alias("shard"),
    )
    pos = F.row_number().over(Window.partitionBy("shard").orderBy("order_key"))
    return sharded.select("doc_id", "source", "order_key", "shard", pos.alias("pos"))


def global_shuffle_scaled(docs: DataFrame, n_shards: int = N_SHARDS) -> DataFrame:
    """The 100 TB deployment form of e5_global_shuffle — identical
    semantics (seeded md5 permutation → shard + in-shard position), zero
    single-node stages:

    - shard assignment = ``repartitionByRange(n, order_key)``: boundaries
      come from distributed sampling, each shard is ONE partition — no
      global-order window (the oracle form's ntile) ever materializes.
    - in-shard position = partition-local arithmetic on
      ``monotonically_increasing_id`` AFTER ``sortWithinPartitions``:
      the id's low 33 bits are the row's index within its partition, so
      position needs no window and no further shuffle.

    Differs from the ntile form only at shard boundaries (sampled vs
    exact quantiles) — pinned by tests/test_quality.py, which checks the
    permutation order and per-shard contiguity are identical."""
    keyed = docs.withColumn(
        "order_key",
        F.md5(F.concat(F.lit(SHUFFLE_SEED), F.col("doc_id").cast("string"))),
    )
    ranged = keyed.repartitionByRange(n_shards, "order_key").sortWithinPartitions(
        "order_key"
    )
    mid = F.monotonically_increasing_id()
    return ranged.select(
        "doc_id",
        "source",
        "order_key",
        (F.spark_partition_id() + 1).alias("shard"),
        # long, not int: a 100 TB shard can exceed 2^31 rows and the
        # 33-bit partition-local index goes right up to 2^33
        (mid.bitwiseAND(F.lit((1 << 33) - 1)) + 1).alias("pos"),
    )


def e5_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum data ordering: documents sorted into quality QUARTILES
    (easy/high-quality first), seeded-shuffled WITHIN each quartile — the
    banded ordering curriculum-learning pipelines feed the trainer
    (ordered between bands, decorrelated within). Band = ntile(4) over
    the distinct-token-ratio quality signal; within-band position =
    row_number over the md5 permutation (same key construction as
    e5_global_shuffle, so the within-band order is reproducible and
    engine-exact). Global training position = (band, pos) lexicographic.

    Scale: both windows are per-band after a 4-way split; the quartile
    assignment itself uses the skew-proof histogram decomposition at
    100 TB (see zscore_by_source_scaled — identical rank algebra)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    quality = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    scored = docs.select(
        "doc_id",
        F.round(quality, 6).alias("quality"),
        F.md5(F.concat(F.lit(SHUFFLE_SEED), F.col("doc_id").cast("string"))).alias(
            "shuffle_key"
        ),
    )
    band = F.ntile(4).over(Window.orderBy(F.col("quality").desc(), F.col("doc_id")))
    banded = scored.select("doc_id", "quality", "shuffle_key", band.alias("band"))
    pos = F.row_number().over(Window.partitionBy("band").orderBy("shuffle_key"))
    return banded.select("doc_id", "quality", "band", pos.alias("pos_in_band"))


def curriculum_order_scaled(docs: DataFrame) -> DataFrame:
    """The 100 TB deployment form of e5_curriculum_order — identical
    output (pinned row-for-row by tests/test_quality.py), with BOTH
    data-sized global windows decomposed away (the round-8 verdict's one
    remaining uncoded scale form):

    - the quartile assignment replaces ``ntile(4) OVER (ORDER BY quality
      DESC, doc_id)`` — a single-partition sort of the whole corpus —
      with the histogram-CDF rank decomposition of
      ``zscore_by_source_scaled``: rank = (# docs with higher quality,
      from a broadcast value-histogram running sum) + (row_number within
      the tie group), then ntile's uneven-tile arithmetic as plain
      column math from (rank, n). The only unpartitioned window runs
      over the DISTINCT quality values (metadata-sized: one row per
      distinct ratio, ≤ max token count² values), never over documents;
      per-task work is bounded by the largest tie group.
    - the in-band position replaces ``row_number() OVER (PARTITION BY
      band ...)`` — four partitions, each a quarter of the corpus in one
      task — with the same decomposition over a 2-hex-char prefix bucket
      of the md5 shuffle key: position = (# docs in lexicographically
      smaller buckets of this band, from a broadcast 4×256-row
      histogram) + (row_number within (band, bucket)). The prefix is a
      PREFIX of the order key, so (bucket, key) lexicographic equals key
      order exactly — not an approximation — and md5 uniformity bounds
      every task at ~n/1024 (at larger corpora, widen the prefix: 4 hex
      chars → 256 k buckets).
    """
    toks = F.split(F.col("text"), " ")
    quality = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    scored = docs.select(
        "doc_id",
        F.round(quality, 6).alias("quality"),
        F.md5(F.concat(F.lit(SHUFFLE_SEED), F.col("doc_id").cast("string"))).alias(
            "shuffle_key"
        ),
    )
    hist = scored.groupBy("quality").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = Window.orderBy(F.col("quality").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = hist.select(
        "quality", F.coalesce(F.sum("cnt").over(w_cum), F.lit(0)).alias("below")
    )
    n_total = scored.agg(F.count(F.lit(1)).alias("n"))
    local = F.row_number().over(Window.partitionBy("quality").orderBy("doc_id"))
    ranked = (
        scored.withColumn("local_rn", local)
        .join(F.broadcast(cum), "quality")
        .crossJoin(F.broadcast(n_total))
        .withColumn("rnk", F.col("below") + F.col("local_rn"))
    )
    # ntile(4) over n rows: the first n%4 tiles hold ceil(n/4) rows
    k = F.lit(4)
    q, rem = (F.col("n") / k).cast("long"), F.col("n") % k
    big = rem * (q + 1)
    band = F.when(
        F.col("rnk") <= big, ((F.col("rnk") - 1) / (q + 1)).cast("long")
    ).otherwise(
        # unreachable when q = 0 (then big = n); guard for ANSI's eager cast
        rem + ((F.col("rnk") - 1 - big) / F.greatest(q, F.lit(1))).cast("long")
    ) + 1
    banded = ranked.select(
        "doc_id",
        "quality",
        "shuffle_key",
        F.substring("shuffle_key", 1, 2).alias("bucket"),
        band.cast("int").alias("band"),
    )
    bh = banded.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    w_b = (
        Window.partitionBy("band")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bcum = bh.select(
        "band",
        "bucket",
        F.coalesce(F.sum("cnt").over(w_b), F.lit(0)).alias("pbelow"),
    )
    plocal = F.row_number().over(
        Window.partitionBy("band", "bucket").orderBy("shuffle_key")
    )
    return (
        banded.withColumn("p_rn", plocal)
        .join(F.broadcast(bcum), ["band", "bucket"])
        .select(
            "doc_id",
            "quality",
            "band",
            (F.col("pbelow") + F.col("p_rn")).cast("int").alias("pos_in_band"),
        )
    )


def e5_curriculum_order_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog entry for the skew-proof curriculum ordering — identical
    output to e5_curriculum_order (same oracle), different physical plan:
    histogram-CDF quartiles + prefix-bucketed in-band positions instead
    of one global sort and four corpus-quarter window tasks."""
    return curriculum_order_scaled(load_table(spark, sf_dir, "documents"))


def w11_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE active days per user
    (monitoring/dashboard.py:311-382 reports activity continuity; the
    reference loops per case, this is the one-pass relational form).
    Classic island key: day − row_number(day) is constant within a
    consecutive run. One shuffle on user_id; the distinct and both
    window/group steps reuse that partitioning."""
    events = load_table(spark, sf_dir, "events")
    days = events.select("user_id", F.to_date("ts").alias("day")).distinct()
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("day"))
    islands = days.select("user_id", "day", F.date_sub(F.col("day"), rn).alias("island_key"))
    return (
        islands.groupBy("user_id", "island_key")
        .agg(
            F.min("day").alias("island_start"),
            F.max("day").alias("island_end"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .drop("island_key")
        .select("user_id", "island_start", "island_end", "n_days")
    )


def e5_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic sampling: keep a document with
    probability equal to its quality weight (here the distinct-token
    ratio — the repetition-penalizing signal from the gopher battery).
    The acceptance draw is the Knuth multiplicative hash of doc_id mapped
    to [0,1): deterministic, engine-exact integer math (same construction
    as p8_stable_sample), so the SAME documents survive on every run,
    engine, and cluster size — unlike ``df.sample`` whose outcome depends
    on partitioning. This is the up/down-weighting primitive a corpus
    mixture applies per quality band (e5_domain_mixture holds the
    per-source weights; this applies a per-DOCUMENT weight)."""
    from .relational5 import KNUTH, MOD

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    weight = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    draw = F.pmod(F.col("doc_id") * F.lit(KNUTH), F.lit(MOD)) / F.lit(float(MOD))
    return docs.select(
        "doc_id",
        "source",
        F.round(weight, 6).alias("weight"),
        F.round(draw, 6).alias("draw"),
        (draw < weight).alias("kept"),
    )


TOKEN_BUDGET_PER_SOURCE = 1000


def e5_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit each source to a TOKEN budget — the final packing constraint of
    corpus assembly ("2 T tokens total, at most B from source s"), a
    different primitive from the doc-count cap (e5_stratified_sample) and
    the per-doc acceptance weight (e5_weighted_sample): documents are
    taken in stable content-hash order (deterministic, id- and
    partitioning-independent) and a source's prefix is kept while the
    RUNNING token total stays within budget — a doc is admitted iff the
    cumulative count INCLUDING it is ≤ B, so the boundary doc that would
    overflow is dropped and admission is a pure function of the corpus.
    One window shuffle on the source key; emits the per-source fit
    report. At 100 TB the running sum is the same plan — cumulative
    window over (source) ordered by (hash, doc_id) — with sources as
    independent partitions; skewed giant sources range-partition by the
    hash prefix within the source before the window."""
    from .dedup import _portable_token_hash

    docs = load_table(spark, sf_dir, "documents")
    h = F.pmod(_portable_token_hash(F.col("text")), F.lit(1_000_000))
    w = Window.partitionBy("source").orderBy(F.col("h").asc(), F.col("doc_id").asc())
    ranked = docs.select(
        "doc_id",
        "source",
        h.alias("h"),
        F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != "")).alias(
            "n_tokens"
        ),
    ).withColumn("cum_tokens", F.sum("n_tokens").over(w))
    kept = ranked.filter(F.col("cum_tokens") <= TOKEN_BUDGET_PER_SOURCE)
    fit = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.max("cum_tokens").cast("bigint").alias("tokens_used"),
        F.min("h").cast("bigint").alias("first_hash"),
        F.max("h").cast("bigint").alias("last_hash"),
    )
    # every source appears in the fit report — one whose very first doc
    # in hash order overflows the budget keeps NOTHING and must show as
    # an n_docs_kept=0 row, not vanish (a consumer could not otherwise
    # tell 'fully over budget' from 'absent from corpus')
    return (
        ranked.select("source").distinct()
        .join(fit, "source", "left")
        .na.fill({"n_docs_kept": 0, "tokens_used": 0})
        .withColumn(
            "budget_fill",
            F.round(
                F.col("tokens_used").cast("double")
                / F.lit(float(TOKEN_BUDGET_PER_SOURCE)),
                6,
            ),
        )
        .orderBy("source")
    )


_BUDGET_BUCKETS = 32  # hash-prefix buckets per source; scale with source size


def token_budget_sample_scaled(
    docs: DataFrame, budget: int = TOKEN_BUDGET_PER_SOURCE
) -> DataFrame:
    """The 100 TB deployment form of e5_token_budget_sample — identical
    fit report, NO whole-source window task. The oracle form's cumulative
    window sorts each source in ONE task (a straggler when one source is
    half the corpus); here the running sum decomposes via DETERMINISTIC
    hash-prefix bucketing (the two-pass ``flows._numbered_jobs`` shape,
    minus its sampled range boundaries — h is already uniform in [0, 1e6),
    so fixed-width buckets are balanced by construction and need no
    persist to pin them):

    1. bucket = h DIV (1e6 / _BUDGET_BUCKETS) — monotone in h, so bucket
       order IS admission order; a giant source spans _BUDGET_BUCKETS
       independent tasks instead of one.
    2. per-(source, bucket) token tallies — a metadata-sized aggregate
       (#sources × #buckets rows); each bucket's OFFSET (tokens owed to
       earlier buckets of its source) is a running sum over that tiny
       table, broadcast-joined back. No driver collect anywhere.
    3. cum_tokens = offset + bucket-local cumulative sum over (h, doc_id);
       every window task is bounded by source/#buckets, not by the
       largest source.

    Admission (cum ≤ budget) and the per-source fit report then match the
    oracle form row-for-row — pinned by tests/test_quality.py the same way
    ``zscore_by_source_scaled`` and ``global_shuffle_scaled`` are."""
    from .dedup import _portable_token_hash

    width = max(1, 1_000_000 // _BUDGET_BUCKETS)
    h = F.pmod(_portable_token_hash(F.col("text")), F.lit(1_000_000))
    ranked = docs.select(
        "doc_id",
        "source",
        h.alias("h"),
        F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != "")).alias(
            "n_tokens"
        ),
    ).withColumn("_bkt", F.floor(F.col("h") / width).cast("int"))
    tallies = ranked.groupBy("source", "_bkt").agg(
        F.sum("n_tokens").alias("_bkt_tokens")
    )
    w_off = (
        Window.partitionBy("source")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = tallies.select(
        "source",
        "_bkt",
        F.coalesce(F.sum("_bkt_tokens").over(w_off), F.lit(0)).alias("_offset"),
    )
    w_local = (
        Window.partitionBy("source", "_bkt")
        .orderBy(F.col("h").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = ranked.join(F.broadcast(offsets), ["source", "_bkt"]).withColumn(
        "cum_tokens", F.col("_offset") + F.sum("n_tokens").over(w_local)
    )
    kept = cum.filter(F.col("cum_tokens") <= budget)
    fit = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.max("cum_tokens").cast("bigint").alias("tokens_used"),
        F.min("h").cast("bigint").alias("first_hash"),
        F.max("h").cast("bigint").alias("last_hash"),
    )
    return (
        ranked.select("source").distinct()
        .join(fit, "source", "left")
        .na.fill({"n_docs_kept": 0, "tokens_used": 0})
        .withColumn(
            "budget_fill",
            F.round(
                F.col("tokens_used").cast("double") / F.lit(float(budget)), 6
            ),
        )
        .orderBy("source")
    )


def e5_token_budget_sample_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog entry for the two-pass decomposition — identical output to
    e5_token_budget_sample (same oracle, the zscore_by_source_scaled
    pattern), different physical plan: range partition + tally offsets +
    partition-local cumsum instead of one whole-source window task."""
    return token_budget_sample_scaled(load_table(spark, sf_dir, "documents"))


def e5_soft_dedup_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOFT dedup: instead of dropping near-duplicates, DOWN-WEIGHT them
    — every document is kept with probability 1/|its near-dup cluster|,
    so each cluster contributes ~one document's worth of mass to the
    training mix while which member survives stays deterministic (the
    Knuth-hash acceptance draw of e5_weighted_sample). This is the
    repetition-control middle ground between hard removal
    (e5_corpus_curation's LSH stage) and no dedup: boilerplate families
    are not erased, they are normalized to unit weight — the treatment
    mixture builders apply when duplicates carry signal (popularity) but
    must not dominate.

    Clusters come from the oracle-checked connected-components pass
    (e1_dedup_clusters — LSH pairs → min-label propagation); documents
    outside the pair graph are singletons with weight 1. Scale posture is
    the cluster pass's (banded LSH + shallow label propagation); the
    weighting itself is one broadcast-joined projection."""
    from .dedup import e1_dedup_clusters
    from .relational5 import KNUTH, MOD

    docs = load_table(spark, sf_dir, "documents")
    clusters = e1_dedup_clusters(spark, sf_dir).select(
        "doc_id", "cluster_id", "cluster_size"
    )
    joined = docs.select("doc_id", "source").join(clusters, "doc_id", "left")
    size = F.coalesce(F.col("cluster_size"), F.lit(1)).cast("bigint")
    weight = F.lit(1.0) / size
    draw = F.pmod(F.col("doc_id") * F.lit(KNUTH), F.lit(MOD)) / F.lit(float(MOD))
    return joined.select(
        "doc_id",
        "source",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        size.alias("cluster_size"),
        F.round(weight, 6).alias("weight"),
        F.round(draw, 6).alias("draw"),
        (draw < weight).alias("kept"),
    )


GLOBAL_TOKEN_BUDGET = 6000


def e5_global_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE global token budget allocated across sources by WATER-FILLING
    — the corpus-assembly constraint e5_token_budget_sample's fixed
    per-source budget can't express ("2 T tokens total", not "B per
    source"): sources smaller than the water level keep everything; the
    level is set so the capped sources' share exhausts the remainder.
    This is how a mixture target is met without starving small domains
    or letting one crawl swallow the budget.

    Exact and engine-portable by construction — ALL integer arithmetic:
    sort the per-source token totals ascending (t_1 ≤ … ≤ t_n, prefix
    sums cum_i); prefix i is feasible iff every remaining source exceeds
    the implied level, i.e. t_{i+1}·(n−i) > B − cum_i, and the chosen
    prefix is the FIRST feasible one (all comparisons cross-multiplied,
    no division); the level is then (B − cum_i) DIV (n − i), so
    Σ min(t_s, level) ≤ B with integer caps. Per-source admission reuses
    the token-budget prefix rule (stable content-hash order, running sum
    ≤ cap). The allocation itself runs on the per-source TOTALS table —
    #sources rows, metadata-sized: the windows there cost nothing at any
    corpus scale, and the document-level pass is the same one-window (or
    hash-prefix-bucketed, see token_budget_sample_scaled) shape as the
    fixed-budget operator. Emits the per-source allocation report."""
    from .dedup import _portable_token_hash

    B = GLOBAL_TOKEN_BUDGET
    docs = load_table(spark, sf_dir, "documents")
    h = F.pmod(_portable_token_hash(F.col("text")), F.lit(1_000_000))
    ranked = docs.select(
        "doc_id",
        "source",
        h.alias("h"),
        F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != "")).alias(
            "n_tokens"
        ),
    )
    totals = ranked.groupBy("source").agg(
        F.sum("n_tokens").cast("bigint").alias("t")
    )
    w_ord = Window.orderBy(F.col("t").asc(), F.col("source").asc())
    sorted_t = totals.select(
        "source",
        "t",
        F.row_number().over(w_ord).alias("i"),
        F.sum("t").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum"
        ),
        F.lead("t").over(w_ord).alias("t_next"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    # feasibility of "keep sources 1..i fully, cap the rest": the next
    # source must overflow the implied level — t_next·(n−i) > B − cum_i.
    # i = 0 (cap everyone) is feasible iff t_1·n > B. The chosen split is
    # the FIRST feasible prefix; if none is (B ≥ Σt) every source keeps
    # everything and the level is the max total. ONE aggregation over
    # the totals table computes all three candidates (round 12: the
    # earlier zero/feasible agg pair evaluated the scan→totals→window
    # lineage twice — min_by over when()-masked columns folds the
    # feasible-prefix search into the same ObjectHashAggregate; null
    # keys are skipped by min_by, so infeasible rows never win).
    feas = (
        (F.col("t_next").isNotNull())
        & (F.col("t_next") * (F.col("n") - F.col("i")) > F.lit(B) - F.col("cum"))
        & (F.col("cum") <= F.lit(B))
    )
    level = sorted_t.agg(
        F.min(F.when(F.col("i") == 1, F.col("t"))).alias("t1"),
        F.max("n").alias("n"),
        F.max("t").alias("t_max"),
        F.min_by(
            F.when(feas, F.expr(f"(CAST({B} AS BIGINT) - cum) div (n - i)")),
            F.when(feas, F.col("i")),
        ).alias("level_i"),
    ).select(
        F.coalesce(
            F.when(
                F.col("t1") * F.col("n") > F.lit(B),
                F.expr(f"CAST({B} AS BIGINT) div n"),
            ),
            F.col("level_i"),
            F.col("t_max"),  # B >= grand total: everyone fully kept
        ).alias("level")
    )
    caps = totals.crossJoin(F.broadcast(level)).select(
        "source", "t", F.least(F.col("t"), F.col("level")).alias("cap")
    )
    w = Window.partitionBy("source").orderBy(F.col("h").asc(), F.col("doc_id").asc())
    cum_docs = ranked.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    kept = cum_docs.join(F.broadcast(caps), "source").filter(
        F.col("cum_tokens") <= F.col("cap")
    )
    fit = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.max("cum_tokens").cast("bigint").alias("tokens_used"),
    )
    return (
        caps.join(fit, "source", "left")
        .na.fill({"n_docs_kept": 0, "tokens_used": 0})
        .select(
            "source",
            F.col("t").alias("total_tokens"),
            F.col("cap").cast("bigint").alias("cap"),
            (F.col("t") <= F.col("cap")).alias("fully_kept"),
            "n_docs_kept",
            "tokens_used",
        )
        .orderBy("source")
    )


def e3_zscore_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group feature normalization: z-score, percent rank, and decile
    of document length WITHIN each source — the per-domain normalization
    step before mixing heterogeneous sources (raw length is not
    comparable across a code crawl and a chat log). One shuffle on
    source; the aggregate (avg/stddev) broadcasts back over the same
    partitioning and both window functions reuse the same sort.

    Scale caveat: ``partitionBy(source)`` sorts each source in ONE task —
    fine for many smallish domains, a straggler when one source is half
    the corpus. ``zscore_by_source_scaled`` below is the equivalent
    decomposition with no per-source global sort (histogram + per-value
    local windows); it is pinned row-identical to this form by
    tests/test_quality.py."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source")
    w_ord = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    z = (F.col("n_chars") - F.avg("n_chars").over(w)) / F.stddev_samp(
        "n_chars"
    ).over(w)
    return docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.round(z, 4).alias("z_len"),
        F.round(F.percent_rank().over(w_ord), 6).alias("len_pct_rank"),
        F.ntile(10).over(w_ord).alias("len_decile"),
    )


def zscore_by_source_scaled(docs: DataFrame) -> DataFrame:
    """The skew-proof deployment form of e3_zscore_by_source: identical
    output, no per-source global sort. Rank decomposes as

        rank(row) = (# rows of this source with a smaller value)   [cum]
                  + (row_number among ties, by doc_id)             [local]

    - ``cum`` comes from a HISTOGRAM: groupBy(source, n_chars) counts —
      the running sum over that is a window over sources × distinct
      values (tiny: thousands of rows), never over documents.
    - ``local`` is a window over (source, n_chars) — many SMALL
      partitions, each one tie-group, so no task ever holds a whole
      source. percent_rank = (rank−1)/(n−1) and ntile's uneven-tile
      arithmetic are then plain column math from (rank, n).

    The moment partitionBy(source) would straggle (one domain = half the
    corpus), this shape keeps every task bounded by the largest TIE
    GROUP instead of the largest SOURCE."""
    hist = docs.groupBy("source", "n_chars").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = hist.select(
        "source",
        "n_chars",
        F.coalesce(F.sum("cnt").over(w_cum), F.lit(0)).alias("below"),
    )
    stats = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("n_chars").alias("mu"),
        F.stddev_samp("n_chars").alias("sd"),
    )
    local = F.row_number().over(
        Window.partitionBy("source", "n_chars").orderBy("doc_id")
    )
    ranked = (
        docs.select("doc_id", "source", "n_chars")
        .withColumn("local_rn", local)
        .join(F.broadcast(cum), ["source", "n_chars"])
        .join(F.broadcast(stats), "source")
        .withColumn("rnk", F.col("below") + F.col("local_rn"))
    )
    # ntile(k) over n rows: the first n%k tiles hold ceil(n/k) rows
    k = F.lit(10)
    q, rem = (F.col("n") / k).cast("long"), F.col("n") % k
    big = rem * (q + 1)  # rows covered by the oversized tiles
    tile = F.when(
        F.col("rnk") <= big, ((F.col("rnk") - 1) / (q + 1)).cast("long")
    ).otherwise(
        # guard: this branch is unreachable when q = 0 (then big = n), but
        # ANSI mode evaluates the cast eagerly enough to need a nonzero div
        rem + ((F.col("rnk") - 1 - big) / F.greatest(q, F.lit(1))).cast("long")
    ) + 1
    return ranked.select(
        "doc_id",
        "source",
        "n_chars",
        F.round((F.col("n_chars") - F.col("mu")) / F.col("sd"), 4).alias("z_len"),
        # greatest(n-1, 1): a singleton source must give 0.0 exactly like
        # percent_rank over a 1-row partition, not NULL from 0/0
        F.round(
            (F.col("rnk") - 1) / F.greatest(F.col("n") - 1, F.lit(1)), 6
        ).alias("len_pct_rank"),
        tile.cast("int").alias("len_decile"),
    )


def e3_zscore_by_source_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog entry for the skew-proof decomposition — identical output
    to e3_zscore_by_source (same oracle, like the vectorized minhash
    twin), different physical plan: histogram + tie-group windows instead
    of one whole-source sort per task."""
    return zscore_by_source_scaled(load_table(spark, sf_dir, "documents"))


QUERIES = {
    "e3_gopher_rules": e3_gopher_rules,
    "e3_zscore_by_source_scaled": e3_zscore_by_source_scaled,
    "e3_text_normalize": e3_text_normalize,
    "e3_zscore_by_source": e3_zscore_by_source,
    "e5_global_shuffle": e5_global_shuffle,
    "e5_curriculum_order": e5_curriculum_order,
    "e5_curriculum_order_scaled": e5_curriculum_order_scaled,
    "e5_weighted_sample": e5_weighted_sample,
    "e5_token_budget_sample": e5_token_budget_sample,
    "e5_token_budget_sample_scaled": e5_token_budget_sample_scaled,
    "e5_global_token_budget": e5_global_token_budget,
    "e5_soft_dedup_sample": e5_soft_dedup_sample,
    "w11_gaps_islands": w11_gaps_islands,
}

_STOPLIST_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)

ORACLES = {
    "e5_token_budget_sample": f"""
        WITH ranked AS (
            SELECT doc_id, source,
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(text, ''),
                                      c -> CAST(ascii(c) AS BIGINT))),
                       (a, c) -> (a * 131 + c) % 2147483647) % 1000000 AS h,
                   len(list_filter(string_split(text, ' '),
                                   t -> t <> '')) AS n_tokens
            FROM documents
        ), cum AS (
            SELECT *, sum(n_tokens) OVER (
                PARTITION BY source ORDER BY h ASC, doc_id ASC
                ROWS UNBOUNDED PRECEDING) AS cum_tokens
            FROM ranked
        ), kept AS (
            SELECT * FROM cum WHERE cum_tokens <= {TOKEN_BUDGET_PER_SOURCE}
        ), fit AS (
            SELECT source,
                   count(*) AS n_docs_kept,
                   CAST(max(cum_tokens) AS BIGINT) AS tokens_used,
                   CAST(min(h) AS BIGINT) AS first_hash,
                   CAST(max(h) AS BIGINT) AS last_hash
            FROM kept GROUP BY source
        )
        SELECT s.source,
               coalesce(f.n_docs_kept, 0) AS n_docs_kept,
               CAST(coalesce(f.tokens_used, 0) AS BIGINT) AS tokens_used,
               f.first_hash,
               f.last_hash,
               round(CAST(coalesce(f.tokens_used, 0) AS DOUBLE)
                     / CAST({TOKEN_BUDGET_PER_SOURCE} AS DOUBLE), 6)
                   AS budget_fill
        FROM (SELECT DISTINCT source FROM ranked) s
        LEFT JOIN fit f USING (source)
        ORDER BY s.source
    """,
    "e3_gopher_rules": f"""
        WITH w AS (
            SELECT doc_id, text, string_split(text, ' ') AS ws,
                   len(string_split(text, ' ')) AS n_words
            FROM documents
        ), m AS (
            SELECT doc_id, n_words,
                   CAST(length(text) - (n_words - 1) AS DOUBLE) / n_words
                       AS mean_wlen,
                   CAST(len(list_distinct(ws)) AS DOUBLE) / n_words AS dratio,
                   len(list_intersect(ws, [{_STOPLIST_SQL}])) > 0 AS ok_stopword
            FROM w
        )
        SELECT doc_id, n_words,
               round(mean_wlen, 4) AS mean_word_len,
               round(dratio, 4) AS distinct_ratio,
               n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS} AS ok_n_words,
               mean_wlen BETWEEN {MIN_MEAN_WLEN} AND {MAX_MEAN_WLEN}
                   AS ok_mean_word_len,
               dratio >= {MIN_DISTINCT_RATIO} AS ok_distinct_ratio,
               ok_stopword,
               (n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS})
                   AND (mean_wlen BETWEEN {MIN_MEAN_WLEN} AND {MAX_MEAN_WLEN})
                   AND dratio >= {MIN_DISTINCT_RATIO}
                   AND ok_stopword AS passed
        FROM m
    """,
    "e3_text_normalize": """
        WITH messy AS (
            SELECT doc_id, text,
                   CASE doc_id % 3
                     WHEN 0 THEN '  ' || replace(text, ' ', '   ')
                     WHEN 1 THEN upper(text) || chr(9) || chr(9)
                     ELSE chr(9) || ' ' || text || '  '
                   END AS raw
            FROM documents
        )
        SELECT doc_id,
               length(raw) AS raw_len,
               length(lower(trim(regexp_replace(raw, '[ \t]+', ' ', 'g'))))
                   AS norm_len,
               md5(lower(trim(regexp_replace(raw, '[ \t]+', ' ', 'g'))))
                   AS norm_key,
               lower(trim(regexp_replace(raw, '[ \t]+', ' ', 'g'))) = text
                   AS roundtrips
        FROM messy
    """,
    "e5_global_shuffle": f"""
        WITH keyed AS (
            SELECT doc_id, source,
                   md5('{SHUFFLE_SEED}' || CAST(doc_id AS VARCHAR)) AS order_key
            FROM documents
        ), sharded AS (
            SELECT doc_id, source, order_key,
                   CAST(ntile({N_SHARDS}) OVER (ORDER BY order_key) AS INT)
                       AS shard
            FROM keyed
        )
        SELECT doc_id, source, order_key, shard,
               CAST(row_number() OVER (PARTITION BY shard ORDER BY order_key)
                    AS INT) AS pos
        FROM sharded
    """,
    "e5_curriculum_order": """
        WITH scored AS (
            SELECT doc_id,
                   round(CAST(len(list_distinct(string_split(text, ' ')))
                              AS DOUBLE) / len(string_split(text, ' ')), 6)
                       AS quality,
                   md5('seed42:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
            FROM documents
        ), banded AS (
            SELECT doc_id, quality, shuffle_key,
                   CAST(ntile(4) OVER (ORDER BY quality DESC, doc_id) AS INT)
                       AS band
            FROM scored
        )
        SELECT doc_id, quality, band,
               CAST(row_number() OVER (PARTITION BY band ORDER BY shuffle_key)
                    AS INT) AS pos_in_band
        FROM banded
    """,
    "e5_weighted_sample": """
        WITH m AS (
            SELECT doc_id, source,
                   CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                       / len(string_split(text, ' ')) AS weight,
                   (doc_id * 2654435761) % 4294967296 / 4294967296.0 AS draw
            FROM documents
        )
        SELECT doc_id, source,
               round(weight, 6) AS weight,
               round(draw, 6) AS draw,
               draw < weight AS kept
        FROM m
    """,
    "e3_zscore_by_source": """
        SELECT doc_id, source, n_chars,
               round((n_chars - avg(n_chars) OVER g)
                     / stddev_samp(n_chars) OVER g, 4) AS z_len,
               round(percent_rank() OVER w, 6) AS len_pct_rank,
               CAST(ntile(10) OVER w AS INT) AS len_decile
        FROM documents
        WINDOW g AS (PARTITION BY source),
               w AS (PARTITION BY source ORDER BY n_chars, doc_id)
    """,
    "w11_gaps_islands": """
        WITH days AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ), keyed AS (
            SELECT user_id, day,
                   day - CAST(row_number() OVER (PARTITION BY user_id
                                                 ORDER BY day) AS INT)
                       AS island_key
            FROM days
        )
        SELECT user_id,
               min(day) AS island_start,
               max(day) AS island_end,
               count(*) AS n_days
        FROM keyed GROUP BY user_id, island_key
    """,
}

# identical output contract, different execution strategy → same oracle
# (the e1_minhash_lsh_vectorized pattern)
ORACLES["e3_zscore_by_source_scaled"] = ORACLES["e3_zscore_by_source"]
ORACLES["e5_curriculum_order_scaled"] = ORACLES["e5_curriculum_order"]
ORACLES["e5_token_budget_sample_scaled"] = ORACLES["e5_token_budget_sample"]


def _soft_dedup_oracle() -> str:
    """Composes the connected-components oracle (recursive CTE) with the
    1/cluster-size weighting — import deferred so module import order
    between quality and dedup stays cycle-free."""
    from .dedup import ORACLES as DEDUP_ORACLES

    return f"""
        WITH clusters AS (
            SELECT doc_id, cluster_id, cluster_size
            FROM ({DEDUP_ORACLES["e1_dedup_clusters"]})
        )
        SELECT d.doc_id,
               d.source,
               coalesce(c.cluster_id, d.doc_id) AS cluster_id,
               CAST(coalesce(c.cluster_size, 1) AS BIGINT) AS cluster_size,
               round(CAST(1 AS DOUBLE) / coalesce(c.cluster_size, 1), 6)
                   AS weight,
               round((d.doc_id * 2654435761) % 4294967296 / 4294967296.0, 6)
                   AS draw,
               (d.doc_id * 2654435761) % 4294967296 / 4294967296.0
                   < CAST(1 AS DOUBLE) / coalesce(c.cluster_size, 1) AS kept
        FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
    """


ORACLES["e5_soft_dedup_sample"] = _soft_dedup_oracle()

ORACLES["e5_global_token_budget"] = f"""
    WITH ranked AS (
        SELECT doc_id, source,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(text, ''),
                                  c -> CAST(ascii(c) AS BIGINT))),
                   (a, c) -> (a * 131 + c) % 2147483647) % 1000000 AS h,
               len(list_filter(string_split(text, ' '),
                               t -> t <> '')) AS n_tokens
        FROM documents
    ), totals AS (
        SELECT source, CAST(sum(n_tokens) AS BIGINT) AS t
        FROM ranked GROUP BY source
    ), sorted_t AS (
        SELECT source, t,
               CAST(row_number() OVER w AS BIGINT) AS i,
               CAST(sum(t) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               lead(t) OVER w AS t_next,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM totals WINDOW w AS (ORDER BY t ASC, source ASC)
    ), zero AS (
        SELECT CASE WHEN min(CASE WHEN i = 1 THEN t END) * max(n)
                        > {GLOBAL_TOKEN_BUDGET}
                    THEN CAST({GLOBAL_TOKEN_BUDGET} // max(n) AS BIGINT)
               END AS level0,
               max(t) AS t_max
        FROM sorted_t
    ), feas AS (
        SELECT min_by(CAST(({GLOBAL_TOKEN_BUDGET} - cum) // (n - i) AS BIGINT),
                      i) AS level_i
        FROM sorted_t
        WHERE t_next IS NOT NULL
          AND t_next * (n - i) > {GLOBAL_TOKEN_BUDGET} - cum
          AND cum <= {GLOBAL_TOKEN_BUDGET}
    ), lvl AS (
        SELECT coalesce(level0, level_i, t_max) AS level
        FROM zero CROSS JOIN feas
    ), caps AS (
        SELECT source, t, least(t, level) AS cap FROM totals CROSS JOIN lvl
    ), cum_docs AS (
        SELECT source, doc_id, n_tokens,
               CAST(sum(n_tokens) OVER (
                   PARTITION BY source ORDER BY h ASC, doc_id ASC
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        FROM ranked
    ), kept AS (
        SELECT c.source, c.cum_tokens
        FROM cum_docs c JOIN caps USING (source)
        WHERE c.cum_tokens <= caps.cap
    ), fit AS (
        SELECT source, count(*) AS n_docs_kept,
               CAST(max(cum_tokens) AS BIGINT) AS tokens_used
        FROM kept GROUP BY source
    )
    SELECT c.source,
           c.t AS total_tokens,
           CAST(c.cap AS BIGINT) AS cap,
           c.t <= c.cap AS fully_kept,
           coalesce(f.n_docs_kept, 0) AS n_docs_kept,
           CAST(coalesce(f.tokens_used, 0) AS BIGINT) AS tokens_used
    FROM caps c LEFT JOIN fit f USING (source)
    ORDER BY c.source
"""
