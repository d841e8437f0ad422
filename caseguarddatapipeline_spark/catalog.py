"""Assembles the engine's query catalog: name → (spark fn, oracle SQL).

The driver contract (``__spark_entry__.py``) exposes exactly this catalog.
Modules register their QUERIES/ORACLES dicts here; a query without an oracle
gets the driver's weaker rows-only check (reserved for genuinely
non-SQL-expressible operators — hash-based near-dup candidates, pandas-UDF
inference stubs, stateful streaming).

Ordering contract: the driver's CORRECTNESS record covers the first 50
catalog entries in registration order, so ``_PRIORITY`` pins the flagship
query, the 16 bench headliners, the full E1/E2/E5 training-data families,
and one representative per SURVEY §2 family into that window. Every other
query follows in module-registration order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import relational
from .operators.reconcile import RECONCILIATION_SUMMARY_SQL, reconciliation_summary

QueryFn = Callable[[SparkSession, str], DataFrame]

# First 50 = the driver's CORRECTNESS window. The window ROTATES across
# rounds so driver-level evidence accumulates over the whole catalog
# instead of re-proving the same 50 queries: rounds 1-2 covered the
# flagship, the bench headliners, and the full E1/E2/E5 families; round 3
# added the TPC-H shape set and the A/P/J/W/F tails; round 4 swept the
# base-inventory and extension tails; round 5 closed the sweep (the 35
# round-4 additions + all ten round-5 additions), reaching ZERO rotation
# debt: every oracle-backed entry has at least one driver-green round.
# Standing policy from here: every NEW catalog entry is swapped INTO the
# window in the round it is written, displacing multi-round-green
# continuity slots (round 6: e5_token_budget_sample_scaled and
# e3_vocab_induction_2round in; e1_minhash_lsh_vectorized and
# e2_cosine_topk_vectorized out — each has 5 green rounds and stays
# continuously re-proven by BENCH_rN), so debt never re-accumulates.
# Every rotated-out query
# stays oracle-checked by tools/parity.py and tools/driver_sim.py over
# the FULL catalog. Rows-only entries are PERMANENTLY out of the window
# (they can never turn a slot green) and each carries its own exact
# evidence elsewhere: a16_approx_distinct_users is approximate by
# construction (pytest-pinned ±rel-sd vs exact distinct), and
# e2_ivf_search's iterative quantizer is not SQL-expressible — its
# exact-oracle stand-ins are e2_ivf_search_1round/_2round (the same
# algebra with the iteration count pinned), plus the recall assertion in
# tests/test_similarity.py.
_PRIORITY = [
    # Continuity: flagship (driver-green r1-r5; e5_corpus_curation, the
    # two vectorized bench headliners, and the flagship's SQL twin rotated
    # out — 5 green rounds each, and the twin + headliners stay
    # continuously re-proven by BENCH_rN)
    "a1_reconciliation_summary",
    # New in round 6 (zero-debt policy: verified the round they ship):
    # the skew-proof token-budget twin, the 2-round BPE induction, the
    # global water-filling budget allocator, and soft (weighted) dedup
    "e5_token_budget_sample_scaled",
    "e3_vocab_induction_2round",
    "e5_global_token_budget",
    "e5_soft_dedup_sample",
    # (e2_index_stats and e2_filtered_search displaced for these round-6
    # additions — their green rounds stand and they stay in the full
    # parity sweep)
    "e2_ivfpq_residual_1round",
    "e2_ivf_range_search",
    # ... and the materialized postings store's search face (S12 made
    # first-class; displaces e5_token_budget_sample, green r5 and pinned
    # row-identical to its scaled twin, which stays in the window below)
    "s12_postings_search",
    # ... and the intra-document span TRIM (the rewriting half of
    # ExactSubstr; displaces e3_vocab_induction, green r5, whose 2-round
    # successor stays in the window above)
    "e1_span_trim",
    # ... and the cluster-aware leakage-safe split (near-dup families land
    # whole on one side; displaces e2_hard_negatives, green r5 — the E2
    # family keeps three newer representatives in this window)
    "e5_leakage_safe_split",
    # New in round 7 (zero-debt policy): winnowing fingerprints + their
    # near-dup join (MOSS), bigram-LM quality scoring, SQ8 scalar-
    # quantized ANN, and Markov event transitions — displacing
    # a28_grouping_sets and w10-w13 (each green r5 AND r6; they stay in
    # the full parity sweep)
    "e3_winnow_fingerprints",
    "e1_winnow_join",
    "e3_ngram_lm_score",
    "e2_sq8_search",
    "w14_event_transitions",
    # ... plus the data-constrained mixture planner and per-doc unigram
    # entropy (displacing a29_expectations and a30_robust_outliers, each
    # green r5 AND r6; they stay in the full parity sweep)
    "e5_mixture_epochs",
    "e3_doc_entropy",
    # ... and DSIR importance weights (displacing a31_cooccurrence_lift,
    # green r5 AND r6)
    "e3_dsir_weights",
    # ... and the five-granularity duplication datasheet (displacing
    # e3_text_normalize, green r5 AND r6)
    "e5_dedup_report",
    # ... and SQ8's measured recall@3 vs exact L2 (displacing
    # e3_zscore_by_source, green r5 AND r6 — its scaled twin, pinned
    # row-identical, stays in the window)
    "e2_sq8_recall",
    # New in round 8 (zero-debt policy): IVF-composed SQ8 (the routed
    # form of every quantizer tier now exists) + its measured recall@3,
    # and the utility-weighted mixture planner — displacing
    # e1_neardup_recall, e1_semantic_dedup and e2_pq_search_1round (each
    # green r4 AND r7; they stay in the full parity sweep, and the PQ
    # family keeps its composed forms + recall companion in the window)
    "e2_ivfsq8_search_1round",
    "e2_ivfsq8_recall",
    "e5_weighted_mixture",
    # New in round 9 (zero-debt policy): the skew-proof curriculum
    # ordering twin (histogram-CDF quartiles + prefix-bucketed in-band
    # positions — verdict item 2), and the graph-ANN prototype + its
    # measured recall companion backing the graph-vs-IVF decision record
    # (verdict item 3) — displacing e5_curriculum_order (green r5-r8;
    # its scaled twin is pinned row-identical and takes the slot, the
    # e3_zscore precedent), e5_global_shuffle and e5_weighted_sample
    # (each green r5-r8; they stay in the full parity sweep). The
    # round-9 REWORKED operators e1_prefix_filter_join and
    # e1_containment_join (in-join bitmap prune) already hold window
    # slots below, so the rework is driver-verified the round it ships.
    "e5_curriculum_order_scaled",
    "e2_graph_search",
    "e2_graph_recall",
    # ... and the bucketed storage layout's co-location proof (the coded
    # form of the "bucketed at 100 TB" posture; displaces
    # e5_domain_mixture, green r5-r8 — the mixture family keeps
    # e5_weighted_mixture and e5_mixture_epochs in the window)
    "s15_bucketed_colocation",
    # ... and BPE ENCODING (the application side that closes the
    # tokenizer loop: merges learned vocab-side, applied per document as
    # nested greedy replaces in one map-side pass; displaces
    # e3_trigram_familiarity, green r5-r8 — the E3 family keeps its
    # 2-round induction + LM scoring + DSIR entries in the window)
    "e3_bpe_encode",
    # New in round 10 (zero-debt policy): BYTE-REAL multimodal decode —
    # per-tile pixel statistics over genuinely decoded PPM/BMP payloads
    # and per-frame PCM statistics over genuinely decoded WAV payloads
    # (verdict item 1) — displacing their coordinate-only plan twins
    # e4_image_tiles and e4_audio_chunks (each green r4-r9, six rounds;
    # they stay in the full parity sweep), and the N-round BPE encoder
    # applying ALL learned merges (verdict item 6) — displacing
    # e3_gopher_rules (green r4-r9; the E3 family keeps five newer
    # representatives in the window). e4_binaryfile_scan below is
    # REWORKED this round (fixture v4 adds the ppm/bmp classes and makes
    # the PNGs complete real files) and
    # already holds a window slot, so the rework is driver-verified the
    # round it ships.
    "e4_pixel_tile_stats",
    "e4_wav_pcm_frames",
    "e3_bpe_encode_nround",
    # ... and the byte-real nearest-neighbor resize, completing the
    # brief's decode/feature-extract/resize/frame-sample quartet without
    # a stub (displaces e3_zscore_by_source_scaled, green r4-r9 — its
    # unscaled twin's algebra stays pinned row-identical in-suite)
    "e4_image_resize",
    # ... and the G.711 mu-law expansion over the WAV fixture — a real
    # sample-domain transform on decoded bytes, table pinned against
    # CPython's C audioop (displaces e5_sequence_pack, green r4-r9 —
    # packing stays pinned by the composed assembly records)
    "e4_wav_mulaw_frames",
    # New in round 11 (zero-debt policy): the agg-form per-key top-k
    # twin backing the operators/topk.py design record — oracle-checked
    # against the SAME row_number SQL as W2, so the window-vs-aggregate
    # equivalence claim is driver-verified the round it ships
    # (displaces e2_ivfpq_search_1round, green r4-r10, seven rounds;
    # the PQ family keeps its residual form + both recall companions in
    # the window and the full parity sweep still covers it)
    "w2_topk_agg_twin",
    # ... and the SQ8 refine tier (FAISS IndexRefineFlat: quantized
    # candidates re-ranked by exact cosine — displaces e5_dataset_card,
    # green r4-r10, seven rounds; the E5 family keeps five newer
    # representatives in the window)
    "e2_sq8_refine_search",
    # Round-4 E2 continuity
    "e2_pq_recall",
    # Never-driver-verified: round-4 temporal / misc additions
    "t13_incremental_rollup",
    "t14_interpolate_gaps",
    "t15_cdc_apply",
    "n7_rebuild_history",
    "s6_zorder_layout",
    "s14_scan_provenance",
    "u8_quality_classifier",
    # New in round 5: real binaryFile ingestion, exact-oracle IVF search,
    # contrastive negative mining, prefix-filter set-similarity join —
    # verifying these IN the round they were written leaves ZERO
    # oracle-backed entries without a driver-green round after r5
    "e4_binaryfile_scan",
    "e2_ivf_search_2round",
    "e1_prefix_filter_join",
    "e1_span_dedup",
    "e1_containment_join",
    "e3_bm25_search",
    "a32_psi_drift",
]


def build_catalog() -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}

    queries["a1_reconciliation_summary"] = reconciliation_summary
    oracles["a1_reconciliation_summary"] = RECONCILIATION_SUMMARY_SQL

    for module in _registered_modules():
        for name, fn in module.QUERIES.items():
            assert name not in queries, f"duplicate query name {name}"
            queries[name] = fn
        for name, sql in getattr(module, "ORACLES", {}).items():
            assert name in module.QUERIES, f"oracle without query: {name}"
            oracles[name] = sql

    ordered: dict[str, QueryFn] = {}
    for name in _PRIORITY:
        if name in queries:
            ordered[name] = queries[name]
    for name, fn in queries.items():
        if name not in ordered:
            ordered[name] = fn
    return ordered, oracles


def _registered_modules():
    mods = [relational]
    for modname in (
        "scalar", "scalar2", "relational2", "relational3", "relational4",
        "relational5", "relational6", "relational7", "relational8",
        "relational9", "relational10", "sql_twins", "profiling", "timeseries",
        "quality",
        "skew", "sessions", "textops", "dedup", "curation", "similarity", "pq",
        "vecindex", "graphann", "layout", "topk",
        "multimodal", "incremental", "inference", "rest_fetch", "canonical",
        "soap_fetch",
    ):
        mod = __import__(
            f"caseguarddatapipeline_spark.operators.{modname}",
            fromlist=[modname],
        )
        mods.append(mod)
    return mods
