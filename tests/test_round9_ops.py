"""Round-9 operator invariants: the in-join bitmap prune's soundness
bound and the BPE encoder's merge semantics."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_bpe_encode_invariants(spark, sf_dir):
    """Applying two merges can only SHRINK the symbol stream, each
    applied merge occurrence removes exactly one symbol, and the corpus
    must contain documents that actually compressed (the learned merges
    are corpus argmaxes — they occur)."""
    from caseguarddatapipeline_spark.operators.textops import e3_bpe_encode

    rows = e3_bpe_encode(spark, sf_dir).collect()
    assert rows
    assert all(0 < r.n_sym_bpe <= r.n_sym_raw for r in rows)
    assert all(0.0 < r.compression <= 1.0 for r in rows)
    assert any(r.n_sym_bpe < r.n_sym_raw for r in rows)


def test_bpe_encode_matches_manual_merge(spark, tmp_path):
    """On a tiny planted corpus the encoder's counts equal a hand-rolled
    greedy merge application with the same (count desc, pair asc)
    argmax rule."""
    from caseguarddatapipeline_spark.operators.textops import e3_bpe_encode

    texts = {0: "abab abab", 1: "abc abc abc", 2: "xy"}
    spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    # replicate: vocab = {abab:2, abc:3, xy:1}; pair counts:
    # ab: 2*2 + 3 = 7 (argmax) ...
    from collections import Counter

    vocab = Counter()
    for t in texts.values():
        vocab.update(t.split(" "))
    p1 = Counter()
    for w, n in vocab.items():
        for i in range(len(w) - 1):
            p1[w[i : i + 2]] += n
    m1 = min(sorted(p1), key=lambda p: (-p1[p], p))
    seg = {w.replace(m1, "\x01"): n for w, n in vocab.items()}
    p2 = Counter()
    for w, n in seg.items():
        for i in range(len(w) - 1):
            p2[w[i : i + 2]] += n
    m2 = min(sorted(p2), key=lambda p: (-p2[p], p))

    def enc_len(word: str) -> int:
        return len(word.replace(m1, "\x01").replace(m2, "\x02"))

    expected = {
        d: (
            sum(len(w) for w in t.split(" ")),
            sum(enc_len(w) for w in t.split(" ")),
        )
        for d, t in texts.items()
    }
    got = {
        r.doc_id: (r.n_sym_raw, r.n_sym_bpe)
        for r in e3_bpe_encode(spark, str(tmp_path)).collect()
    }
    assert got == expected


def test_bitmap_prune_bound_is_sound_on_adversarial_sets(spark):
    """Direct check of the _doc_stats/_bm_missing invariant on sets
    engineered to collide in the bitmap: for every pair,
    popcount(bm_a & ~bm_b) must never exceed the true count of distinct
    elements of A absent from B (the quantity whose lower bound makes
    the prune sound)."""
    import pyspark.sql.functions as F  # noqa: F811

    from caseguarddatapipeline_spark.operators.dedup import (
        _BM_WORDS,
        _doc_stats,
    )

    # ids chosen mod 256-collision-heavy: many distinct tids share buckets
    rows = []
    sets = {}
    for d in range(6):
        tids = [d * 3 + k * 256 for k in range(20)] + list(range(d * 7, d * 7 + 5))
        sets[d] = set(tids)
        rows += [(d, t) for t in set(tids)]
    toks = spark.createDataFrame(rows, "doc_id long, tid long")
    stats = {r.doc_id: r for r in _doc_stats(toks).collect()}
    for a in sets:
        for b in sets:
            if a == b:
                continue
            pc = 0
            for i in range(_BM_WORDS):
                pc += bin(
                    getattr(stats[a], f"bm{i}") & ~getattr(stats[b], f"bm{i}")
                    & ((1 << 64) - 1)
                ).count("1")
            true_absent = len(sets[a] - sets[b])
            assert pc <= true_absent, (a, b, pc, true_absent)
            assert stats[a].sz == len(sets[a])
