"""Incremental streaming near-dup: cross-batch detection against the
persisted signature index, index growth, and restart-safety of the
probe (duplicate index rows collapse in the pair output)."""

from __future__ import annotations

import json
import os

from caseguarddatapipeline_spark.streaming.neardup import run_neardup_stream


def _write_batch(d: str, n: int, rows) -> None:
    with open(os.path.join(d, f"batch{n}.json"), "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _texts():
    base = " ".join(f"alpha{i} bravo{i} charlie{i}" for i in range(6))
    other = " ".join(f"delta{i} echo{i} foxtrot{i}" for i in range(6))
    return base, other


def test_cross_batch_neardup_detection(spark, tmp_path):
    inp, idx = str(tmp_path / "in"), str(tmp_path / "index")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(inp)
    base, other = _texts()

    # batch 1: two distinct docs — indexed, nothing to flag
    _write_batch(inp, 1, [(1, base), (2, other)])
    run_neardup_stream(spark, inp, idx, out, ck)
    assert not [f for f in os.listdir(out) if f.endswith(".parquet")] or (
        spark.read.parquet(out).count() == 0
    )
    assert spark.read.parquet(idx).select("doc_id").distinct().count() == 2

    # batch 2: doc 3 duplicates doc 1's text; doc 4 is novel
    _write_batch(inp, 2, [(3, base), (4, "zulu yankee xray " * 8)])
    run_neardup_stream(spark, inp, idx, out, ck)
    pairs = {
        (r["new_doc"], r["index_doc"]): r["jaccard"]
        for r in spark.read.parquet(out).collect()
    }
    assert (3, 1) in pairs and pairs[(3, 1)] == 1.0
    assert all(new != 4 for new, _ in pairs)
    # the index grew by batch 2's docs
    assert spark.read.parquet(idx).select("doc_id").distinct().count() == 4

    # batch 3: near (not exact) variant of doc 2 — the last token is
    # dropped, which keeps the shingle set a strict subset (jaccard
    # 15/16) and deterministically preserves every band signature
    _write_batch(inp, 3, [(5, " ".join(other.split(" ")[:-1]))])
    run_neardup_stream(spark, inp, idx, out, ck)
    pairs = {
        (r["new_doc"], r["index_doc"])
        for r in spark.read.parquet(out).collect()
    }
    assert (5, 2) in pairs


def test_poison_rows_divert_instead_of_wedging(spark, tmp_path):
    """Short/null-text rows must not fail the micro-batch (a poison batch
    would replay forever); they divert at the admission gate while
    admissible rows still index and probe."""
    import json

    input_dir = tmp_path / "in"
    input_dir.mkdir()
    base = "the quick brown fox jumps over the lazy dog again and again"
    with open(input_dir / "b1.json", "w") as fh:
        fh.write(json.dumps({"doc_id": 1, "text": base}) + "\n")
        fh.write(json.dumps({"doc_id": 2, "text": "too short"}) + "\n")
        fh.write(json.dumps({"doc_id": 3, "text": None}) + "\n")
        fh.write(json.dumps({"doc_id": None, "text": base}) + "\n")
    run_neardup_stream(
        spark, str(input_dir), str(tmp_path / "idx"), str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    # only the admissible doc reached the index
    idx = spark.read.parquet(str(tmp_path / "idx"))
    assert {r.doc_id for r in idx.select("doc_id").distinct().collect()} == {1}

    # a later near-dup of doc 1 still matches (pipeline alive and correct)
    with open(input_dir / "b2.json", "w") as fh:
        fh.write(json.dumps({"doc_id": 9, "text": base + " twist"}) + "\n")
    run_neardup_stream(
        spark, str(input_dir), str(tmp_path / "idx"), str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    pairs = spark.read.parquet(str(tmp_path / "out")).collect()
    assert {(r.new_doc, r.index_doc) for r in pairs} == {(9, 1)}


def test_maintain_index_ttl_and_compaction(spark, tmp_path):
    """Index maintenance: batches past the horizon drop, surviving
    signatures compact to few files with identical content, and the
    probe still matches against the maintained index."""
    from caseguarddatapipeline_spark.streaming.neardup import maintain_index

    inp, idx = str(tmp_path / "in"), str(tmp_path / "index")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(inp)
    base, other = _texts()

    _write_batch(inp, 1, [(1, "old stale horizon doc " * 4)])
    run_neardup_stream(spark, inp, idx, out, ck)
    _write_batch(inp, 2, [(2, base), (3, other)])
    run_neardup_stream(spark, inp, idx, out, ck)

    kept_before = sorted(
        map(
            tuple,
            spark.read.parquet(idx)
            .filter("ingest_batch = 1")
            .select("doc_id", "band", "band_sig")
            .collect(),
        )
    )
    report = maintain_index(
        spark, idx, keep_batches=1, target_bytes=1 << 20
    )
    assert report["batches_dropped"] == 1
    assert not os.path.isdir(os.path.join(idx, "ingest_batch=0"))

    survivors = spark.read.parquet(idx)
    assert {r.doc_id for r in survivors.select("doc_id").distinct().collect()} == {2, 3}
    kept_after = sorted(
        map(
            tuple,
            survivors.filter("ingest_batch = 1")
            .select("doc_id", "band", "band_sig")
            .collect(),
        )
    )
    assert kept_after == kept_before  # compaction preserved content

    # probe still works against the maintained index: near-dup of doc 2
    _write_batch(inp, 3, [(9, base + " twist")])
    run_neardup_stream(spark, inp, idx, out, ck)
    pairs = {
        (r.new_doc, r.index_doc) for r in spark.read.parquet(out).collect()
    }
    assert (9, 2) in pairs


def test_span_dedup_stream_cross_batch(spark, tmp_path):
    """Streaming span dedup: a later document carrying an indexed passage
    is flagged with the exact duplicated-span count; novel and short docs
    divert or report zero; a third batch probes the grown index."""
    from caseguarddatapipeline_spark.operators.dedup import SPAN_N
    from caseguarddatapipeline_spark.streaming.neardup import (
        run_span_dedup_stream,
    )

    inp, idx = str(tmp_path / "in"), str(tmp_path / "index")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(inp)
    passage = [f"p{i}" for i in range(SPAN_N + 4)]  # 12 tokens, 5 spans
    novel = [f"n{i}" for i in range(SPAN_N + 2)]

    # batch 1: the passage doc + a short (span-less) doc
    _write_batch(inp, 1, [(1, " ".join(passage)), (2, "too short")])
    run_span_dedup_stream(spark, inp, idx, out, ck)
    prof = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(prof) == {1}  # short doc diverted
    assert prof[1]["n_spans"] == 5 and prof[1]["n_dup_spans"] == 0
    assert spark.read.parquet(idx).count() == 5

    # batch 2: doc 3 = passage + novel tail; doc 4 entirely novel
    _write_batch(
        inp, 2, [(3, " ".join(passage + novel)), (4, " ".join(novel))]
    )
    run_span_dedup_stream(spark, inp, idx, out, ck)
    prof = {
        r["doc_id"]: r
        for r in spark.read.parquet(out).filter("batch_id = 1").collect()
    }
    # doc 3 carries all 5 of doc 1's spans among its own
    assert prof[3]["n_dup_spans"] == 5
    assert prof[3]["n_spans"] == len(passage + novel) - SPAN_N + 1
    assert prof[4]["n_dup_spans"] == 0

    # batch 3: exact replay of doc 4's text under a new id — every span
    # is now in the index
    _write_batch(inp, 3, [(5, " ".join(novel))])
    run_span_dedup_stream(spark, inp, idx, out, ck)
    row = (
        spark.read.parquet(out).filter("doc_id = 5").collect()[0]
    )
    assert row["n_dup_spans"] == row["n_spans"] == 3
    assert row["dup_span_fraction"] == 1.0


def test_span_index_maintenance_ttl(spark, tmp_path):
    """maintain_index with span partitioning: TTL drops the oldest batch
    partitions and compaction keeps the remaining spans byte-identical."""
    from caseguarddatapipeline_spark.streaming.neardup import (
        maintain_index,
        run_span_dedup_stream,
    )

    inp, idx = str(tmp_path / "in"), str(tmp_path / "index")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(inp)
    for b in range(1, 4):
        _write_batch(
            inp, b, [(b, " ".join(f"b{b}tok{i}" for i in range(12)))]
        )
        run_span_dedup_stream(spark, inp, idx, out, ck)
    # TTL keeps the 2 NEWEST of batches {0, 1, 2} → expect exactly the
    # rows from batches 1 and 2, byte-identical through compaction
    expected = set(
        map(tuple, spark.read.parquet(idx).filter("ingest_batch >= 1").collect())
    )
    report = maintain_index(
        spark, idx, keep_batches=2, partition_cols=("ingest_batch",)
    )
    assert report["batches_dropped"] == 1
    kept = spark.read.parquet(idx)
    assert set(r["ingest_batch"] for r in kept.select("ingest_batch").distinct().collect()) == {1, 2}
    assert set(map(tuple, kept.collect())) == expected


def test_maintenance_refuses_while_lease_held(spark, tmp_path):
    """maintain_index must abort BEFORE the TTL pass while another run's
    swap lease is fresh — recovery silently no-ops under the lease, so
    proceeding would TTL against an inconsistent index."""
    import pytest

    from caseguarddatapipeline_spark.operators.layout import (
        _LEASE_MARKER,
        _TRASH,
    )
    from caseguarddatapipeline_spark.streaming.neardup import (
        maintain_index,
        run_span_dedup_stream,
    )

    inp, idx = str(tmp_path / "in"), str(tmp_path / "index")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(inp)
    _write_batch(inp, 1, [(1, " ".join(f"t{i}" for i in range(12)))])
    run_span_dedup_stream(spark, inp, idx, out, ck)

    os.makedirs(os.path.join(idx, _TRASH), exist_ok=True)
    open(os.path.join(idx, _TRASH, _LEASE_MARKER), "w").close()
    with pytest.raises(OSError, match="lease"):
        maintain_index(spark, idx, keep_batches=1, partition_cols=("ingest_batch",))
    # the index partition survived untouched
    assert os.path.isdir(os.path.join(idx, "ingest_batch=0"))


def test_index_ownership_gate(tmp_path):
    """Batch ids ahead of the current one mean the checkpoint does not own
    the index dir (fresh checkpoint against accumulated state): fail fast.
    Equal ids are the crash-replay case (index written, commit lost) and
    must pass — the replay overwrites its own partition."""
    import pytest

    from caseguarddatapipeline_spark.streaming.neardup import (
        _check_index_ownership,
    )

    idx = str(tmp_path / "index")
    _check_index_ownership(idx, 0)  # missing dir: first ever batch, fine
    os.makedirs(os.path.join(idx, "ingest_batch=2"))
    with pytest.raises(RuntimeError, match="does not own this state"):
        _check_index_ownership(idx, 0)
    _check_index_ownership(idx, 2)  # replay of the batch that wrote it
    _check_index_ownership(idx, 3)  # normal successor batch


def test_winnow_stream_cross_batch(spark, tmp_path):
    """Streaming winnowing dedup: a later document repeating an indexed
    passage shows a positive duplicated-fingerprint count (the winnowing
    guarantee: any shared K+W-1-token run collides); fully novel docs
    report zero; an exact replay of an indexed text under a new id is
    100% duplicated."""
    from caseguarddatapipeline_spark.streaming.neardup import (
        run_winnow_stream,
    )

    inp, idx = str(tmp_path / "in"), str(tmp_path / "index")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(inp)
    passage = " ".join(f"p{i}" for i in range(24))
    novel = " ".join(f"n{i}" for i in range(24))

    # batch 1: the passage doc + a sub-k-gram doc (diverts: no postings)
    _write_batch(inp, 1, [(1, passage), (2, "too short")])
    run_winnow_stream(spark, inp, idx, out, ck)
    prof = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(prof) == {1}
    assert prof[1]["n_fps"] > 0 and prof[1]["n_dup_fps"] == 0
    n_indexed = spark.read.parquet(idx).count()
    assert n_indexed == prof[1]["n_fps"]

    # batch 2: doc 3 = passage + novel tail (positive overlap), doc 4
    # entirely novel (zero overlap)
    _write_batch(inp, 2, [(3, passage + " " + novel), (4, novel)])
    run_winnow_stream(spark, inp, idx, out, ck)
    prof = {
        r["doc_id"]: r
        for r in spark.read.parquet(out).filter("batch_id = 1").collect()
    }
    assert prof[3]["n_dup_fps"] > 0
    assert prof[4]["n_dup_fps"] == 0

    # batch 3: exact replay of doc 4's text under a new id
    _write_batch(inp, 3, [(5, novel)])
    run_winnow_stream(spark, inp, idx, out, ck)
    row = spark.read.parquet(out).filter("doc_id = 5").collect()[0]
    assert row["n_dup_fps"] == row["n_fps"] > 0
    assert row["dup_fp_fraction"] == 1.0


def test_winnow_index_maintenance_ttl(spark, tmp_path):
    """maintain_index over the winnow fingerprint index: TTL drops the
    oldest batch partitions, compaction keeps the survivors
    byte-identical, and the maintained index still serves probes."""
    from caseguarddatapipeline_spark.streaming.neardup import (
        maintain_index,
        run_winnow_stream,
    )

    inp, idx = str(tmp_path / "in"), str(tmp_path / "index")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(inp)
    texts = {}
    for b in range(1, 4):
        texts[b] = " ".join(f"b{b}tok{i}" for i in range(12))
        _write_batch(inp, b, [(b, texts[b])])
        run_winnow_stream(spark, inp, idx, out, ck)
    expected = set(
        map(
            tuple,
            spark.read.parquet(idx).filter("ingest_batch >= 1").collect(),
        )
    )
    report = maintain_index(
        spark, idx, keep_batches=2, partition_cols=("ingest_batch",)
    )
    assert report["batches_dropped"] == 1
    kept = spark.read.parquet(idx)
    assert set(
        r["ingest_batch"]
        for r in kept.select("ingest_batch").distinct().collect()
    ) == {1, 2}
    assert set(map(tuple, kept.collect())) == expected
    # probes still work: a replay of batch 2's text under a new id is
    # fully duplicated against the maintained index
    _write_batch(inp, 4, [(9, texts[2])])
    run_winnow_stream(spark, inp, idx, out, ck)
    row = spark.read.parquet(out).filter("doc_id = 9").collect()[0]
    assert row["n_dup_fps"] == row["n_fps"] > 0
