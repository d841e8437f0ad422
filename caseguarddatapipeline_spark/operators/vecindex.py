"""Materialized IVF postings store — the vector index as a LAKE TABLE.

SURVEY §2 S12 is the reference's Pinecone upsert: ``{id, values, metadata}``
records pushed to an external vector service per processed case
(etl/flows/process_case.py:292-318; record shape embedder.py:62-66). The
engine's other E2 operators SERVE similarity queries; this module makes the
INDEX itself first-class — a versioned parquet table of (vec_id, emb, cell)
partitioned by ``cell``, the materialized form of the claim every IVF
docstring makes: *at 100 TB, cell persists as a partition column and the
probe join becomes partition pruning*.

Three lifecycle verbs, all through ``sources/versioned`` (immutable
snapshots + atomic latest-pointer swap, so readers mid-search keep their
pinned files and time travel is free):

- ``publish_ivf_postings``: assign every corpus vector to its nearest
  round-1 centroid (the persisted quantizer from
  ``similarity.publish_ivf_index``) and write the postings snapshot.
- ``ivf_postings_upsert``: the Pinecone verb — assign NEW/CHANGED vectors
  with the persisted quantizer (no retrain, matching production IVF
  serving; retraining is a quantizer republish + postings rebuild),
  last-writer-wins on vec_id, publish the merged postings as the next
  version. Copy-on-write like Delta MERGE; with a manifest-bearing table
  format the rewrite narrows to the touched cell partitions.
- ``ivf_postings_delete``: anti-join the ids out, publish the next version.

``s12_postings_search`` is the oracle-backed query face: multi-probe top-3
served FROM the snapshot. Probe cells are k-sized index metadata, so they
are resolved driver-side and pushed as a LITERAL ``cell IN (...)``
predicate — static partition pruning at the parquet scan (~nprobe/k of the
corpus read, no full scan; asserted on the physical plan in
tests/test_vecindex.py). Assignment and probing both use the round-1
centroids — the deployment IVF layout where one trained quantizer routes
both sides — and every float is rounded exactly as IVF1_CENTS_SQL rounds
it, so the DuckDB oracle is exact (parquet round-trips doubles bit-wise;
searching the snapshot equals searching the base table).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources import load_table
from .similarity import (
    _IVF1_NPROBE,
    IVF1_CENTS_SQL,
    _coarse_cells,
    _dbl,
    _dot,
    _ivf1_index,
    _norm,
    _probe_list,
)


def _postings_store_dir(sf_dir: str) -> str:
    from ..sources.stores import fingerprint_store_dir

    return fingerprint_store_dir(
        sf_dir, "embeddings.parquet", "caseguard_annpostings", layout_version=1
    )


def _assign(vectors: DataFrame, cents: list[list[float]]) -> DataFrame:
    """(vec_id, emb, cell) for a batch of raw (vec_id, embedding) vectors,
    assigned by the SAME 6dp argmax as every other IVF stage."""
    corpus = vectors.select("vec_id", _dbl(F.col("embedding")).alias("emb"))
    return _coarse_cells(corpus, cents, keep_emb=True)


def publish_ivf_postings(
    spark: SparkSession, sf_dir: str, base_dir: str | None = None
) -> tuple[str, int]:
    """Build the postings table for the whole embeddings corpus and publish
    it as a cell-partitioned versioned snapshot. One map-only corpus pass
    (broadcast-literal centroids, no shuffle of vectors) + the write.
    Returns (base_dir, version id)."""
    from ..sources.versioned import write_version

    _, cents = _ivf1_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = base_dir or _postings_store_dir(sf_dir)
    return base, write_version(_assign(emb, cents), base, partition_by=["cell"])


def _ensure_postings(spark: SparkSession, sf_dir: str, base_dir: str | None) -> str:
    base = base_dir or _postings_store_dir(sf_dir)
    if not os.path.exists(os.path.join(base, "_LATEST")):
        publish_ivf_postings(spark, sf_dir, base)
    return base


def ivf_postings_upsert(
    spark: SparkSession,
    sf_dir: str,
    vectors: DataFrame,
    base_dir: str | None = None,
) -> tuple[str, int]:
    """Upsert a batch of (vec_id, embedding) vectors into the postings
    store — the reference's Pinecone verb (etl/flows/process_case.py:
    292-318) as a lake-table MERGE: new ids are inserted, existing ids are
    replaced (last writer wins), and the result is the NEXT immutable
    version, so a reader mid-search never sees a half-applied batch and a
    reproducible run pins (base_dir, version). vec_id must be unique
    within the batch (the reference's record set is dict-keyed). The
    quantizer is NOT retrained — batches ride the persisted centroids,
    exactly how serving-path IVF upserts work; drift is handled by
    republishing the quantizer and rebuilding (``publish_ivf_postings``).

    Scale note (round 11): the versioned store commits whole snapshots,
    so THIS implementation rewrites O(corpus) per batch — fine for the
    sandbox store, wrong at 100 TB. The O(touched cells) form is
    ``ivf_postings_upsert_partitioned`` below (ManifestTableFormat
    ``replace_partitions`` — Delta/Iceberg analog: ``replaceWhere`` /
    INSERT OVERWRITE partitions), pinned row-identical to this one by
    tests/test_vecindex_partitioned.py.

    Writer discipline: the version store makes CONCURRENT upserts safe
    (both snapshots land, the pointer stays monotone) but not
    transactional — a racing writer that read the same base loses the
    other's batch (read-modify-write, same as non-conflict-checked
    MERGEs). One writer per store is the contract; the streaming face
    (streaming/vecingest.py) enforces it with its ownership marker, and
    a table format with conflict detection (Delta/Iceberg) upgrades this
    seam in place."""
    from ..sources.versioned import read_latest, write_version

    base = _ensure_postings(spark, sf_dir, base_dir)
    _, cents = _ivf1_index(spark, sf_dir)
    fresh = _assign(vectors, cents)
    merged = (
        read_latest(spark, base)
        .join(fresh.select("vec_id"), "vec_id", "left_anti")
        .unionByName(fresh)
    )
    return base, write_version(merged, base, partition_by=["cell"])


def publish_ivf_postings_partitioned(
    spark: SparkSession, sf_dir: str, base_dir: str
) -> int:
    """Full-corpus postings build over ``ManifestTableFormat`` — the
    store whose commits can later be PARTIAL (``replace_partitions``).
    Same assignment algebra as ``publish_ivf_postings``."""
    from ..sources.tableformat import ManifestTableFormat

    _, cents = _ivf1_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return ManifestTableFormat(base_dir).write(
        _assign(emb, cents), partition_by=["cell"]
    )


def ivf_postings_upsert_partitioned(
    spark: SparkSession,
    sf_dir: str,
    vectors: DataFrame,
    base_dir: str,
) -> int:
    """The O(touched cells) form of ``ivf_postings_upsert`` (round 11):
    identical merge semantics — new ids inserted, existing ids replaced,
    quantizer not retrained — but committed through
    ``ManifestTableFormat.replace_partitions``, so only the cells the
    batch's vectors land in are rewritten; every other cell's files are
    carried forward by reference in the new manifest. At 100 TB a batch
    touches ~|batch| cells out of k, so the commit cost is bounded by
    the batch, not the corpus (this is FAISS ``add()`` over a lake
    table / Delta ``replaceWhere``). Twin-identity with the O(corpus)
    versioned-store form is pinned by tests/test_vecindex_partitioned.py
    — same inputs, byte-identical logical table.

    One subtlety the twin test also covers: a REPLACED id may move
    cells (its new embedding lands elsewhere), so the touched set must
    include the id's OLD cell too or a stale posting would survive —
    handled by probing the current table for the batch ids' home cells
    and folding those into the replaced partition set."""
    from ..sources.tableformat import ManifestTableFormat

    fmt = ManifestTableFormat(base_dir)
    _, cents = _ivf1_index(spark, sf_dir)
    fresh = _assign(vectors, cents)
    current = fmt.read_latest(spark)
    # touched = cells the new vectors land in + the batch ids' current
    # home cells (an updated embedding can migrate cells; its old
    # posting must be rewritten away). Bounded metadata: <= 2x batch.
    touched = {
        int(r["cell"])
        for r in fresh.select("cell").distinct().collect()
    } | {
        int(r["cell"])
        for r in current.join(
            fresh.select("vec_id"), "vec_id", "left_semi"
        )
        .select("cell")
        .distinct()
        .collect()
    }
    replaced = (
        current.filter(F.col("cell").isin(sorted(touched)))
        .select("vec_id", "emb", F.col("cell").cast("int").alias("cell"))
        .join(fresh.select("vec_id"), "vec_id", "left_anti")
        .unionByName(fresh)
    )
    # the touched set is passed EXPLICITLY: a migrated id can leave its
    # old cell empty, and an empty partition writes no files — without
    # the declaration the old cell's files would be carried forward and
    # the stale posting would survive (round-11 review finding)
    return fmt.replace_partitions(
        replaced,
        partition_by=["cell"],
        touched={(f"cell={c}",) for c in touched},
    )


def ivf_postings_delete(
    spark: SparkSession,
    sf_dir: str,
    vec_ids: list[int],
    base_dir: str | None = None,
) -> tuple[str, int]:
    """Delete ids from the postings store as a new immutable version."""
    from ..sources.versioned import read_latest, write_version

    base = _ensure_postings(spark, sf_dir, base_dir)
    kept = read_latest(spark, base).filter(
        ~F.col("vec_id").isin([int(i) for i in vec_ids])
    )
    return base, write_version(kept, base, partition_by=["cell"])


def s12_postings_search(
    spark: SparkSession, sf_dir: str, base_dir: str | None = None
) -> DataFrame:
    """Multi-probe top-3 cosine search served FROM the persisted postings
    snapshot. The probe set (each query's nprobe=4 nearest round-1
    centroids) is nqueries×nprobe index METADATA, so it is resolved
    driver-side and pushed as a literal ``cell IN (...)`` — the parquet
    scan prunes to the probed partitions statically (~nprobe/k of the
    corpus) before the broadcast probe join; candidates then get the
    exact 4dp cosine and a per-query rank. Row-identical to running the
    same assign/probe algebra inline on the base table (pytest pin), so
    the DuckDB oracle below recomputes it from `embeddings` directly."""
    from ..sources.versioned import read_latest

    base = _ensure_postings(spark, sf_dir, base_dir)
    _, cents = _ivf1_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    probe_rows = _probe_list(
        emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            _dbl(F.col("embedding")).alias("q_emb"),
        ),
        cents,
        _IVF1_NPROBE,
    ).collect()  # nqueries×nprobe rows of index metadata, never data-sized
    probes = spark.createDataFrame(
        [(r["query_id"], list(r["q_emb"]), r["probe_cell"]) for r in probe_rows],
        "query_id long, q_emb array<double>, probe_cell int",
    )
    probed_cells = sorted({r["probe_cell"] for r in probe_rows})

    # norms are per-VECTOR values: project each side's norm once before
    # the probe join so the per-candidate work folds only the dot — the
    # same hoist the IVF near-dup verify got this round (HOF folds are
    # interpreted with no CSE; operand order of the division unchanged,
    # so every cosine is bit-identical)
    posts = (
        read_latest(spark, base)
        .filter(F.col("cell").isin(probed_cells))
        .withColumn("nrm", _norm(F.col("emb")))
    )
    probes = probes.withColumn("q_nrm", _norm(F.col("q_emb")))
    cos = _dot(F.col("emb"), F.col("q_emb")) / (
        F.col("nrm") * F.col("q_nrm")
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        posts.join(
            F.broadcast(probes),
            (posts.cell == probes.probe_cell)
            & (posts.vec_id != probes.query_id),
        )
        .select(
            "query_id",
            "vec_id",
            F.col("cell").cast("int").alias("cell"),
            F.round(cos, 4).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= 3)
    )


QUERIES = {"s12_postings_search": s12_postings_search}

# Same quantizer CTE chain as every IVF oracle; assignment AND probing by
# the round-1 centroids (the deployment layout this store materializes).
ORACLES = {
    "s12_postings_search": IVF1_CENTS_SQL
    + """
    , cent_scored_s12 AS (
        SELECT c.vec_id, c.emb, ct.cell,
               round(list_dot_product(c.emb, ct.c_emb)
                     / (sqrt(list_dot_product(c.emb, c.emb))
                        * sqrt(list_dot_product(ct.c_emb, ct.c_emb))), 6) AS cos6
        FROM corpus c CROSS JOIN cents ct
    ), posted AS (
        SELECT vec_id, emb, cell
        FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                           ORDER BY cos6 DESC, cell ASC) AS rn
              FROM cent_scored_s12)
        WHERE rn = 1
    ), queries AS (
        SELECT vec_id AS query_id, emb AS q_emb FROM corpus WHERE vec_id < 5
    ), probe_scored AS (
        SELECT q.query_id, q.q_emb, ct.cell,
               round(list_dot_product(q.q_emb, ct.c_emb)
                     / (sqrt(list_dot_product(q.q_emb, q.q_emb))
                        * sqrt(list_dot_product(ct.c_emb, ct.c_emb))), 6) AS cos6
        FROM queries q CROSS JOIN cents ct
    ), probes AS (
        SELECT query_id, q_emb, cell
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY cos6 DESC, cell ASC) AS rn
              FROM probe_scored)
        WHERE rn <= 4
    ), cand AS (
        SELECT p.query_id, a.vec_id, a.cell,
               round(list_dot_product(a.emb, p.q_emb)
                     / (sqrt(list_dot_product(a.emb, a.emb))
                        * sqrt(list_dot_product(p.q_emb, p.q_emb))), 4) AS cosine
        FROM posted a JOIN probes p
          ON a.cell = p.cell AND a.vec_id <> p.query_id
    )
    SELECT query_id, vec_id, CAST(cell AS INT) AS cell, cosine,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id ASC) AS INT) AS rank
    FROM cand
    QUALIFY rank <= 3
""",
}
