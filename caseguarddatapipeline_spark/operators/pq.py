"""Product-quantization ANN over embeddings (E2 scale path, SURVEY.md §2.10).

The reference delegates vector search to Pinecone (README.md:9,
etl/flows/process_case.py:292-318); ``operators/similarity.py`` brought the
serving path in-engine (brute force, LSH, IVF). This module adds the
MEMORY-side scale story: product quantization (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011 — the scheme behind
FAISS IVFPQ).

A 64-d float embedding (256 B) compresses to M=4 one-byte codes by
splitting the vector into 4 contiguous 16-d subvectors and quantizing each
against its own k=16-centroid codebook — 64× less memory, which is what
makes a 100 TB embedding corpus scannable at all. Search is the classic
asymmetric-distance computation (ADC): per query, a tiny M×k table of
exact query-subvector→centroid distances; a vector's approximate distance
is the sum of M table lookups selected by its codes.

Everything here is relational algebra on equi-joins — no UDF, no collect:

- codebook training is pinned to exactly ONE Lloyd round per subspace,
  seeded by the first k vectors' subvectors (the same determinism contract
  as ``e2_ivf_search_1round``), so the full pipeline has an exact DuckDB
  oracle. Distances are rounded to 6dp before every argmin and centroid
  components to 6dp, so cross-engine float association can never flip an
  assignment; ties break to the lowest cell id in both engines.
- the ADC table (|queries|×M×k rows — 320 here) broadcasts; candidates
  come from an equi-join of the CODES relation (4 small ints per vector)
  with that table, then a (query_id, vec_id) partial-sum groupBy. At 100 TB
  the codes relation is the only corpus-wide scan — the 64×-compressed
  representation — and the groupBy is map-side-combinable (M rows per key).
  For latency-critical serving the same table feeds a numpy gather inside
  mapInPandas; for recall-critical routing PQ composes with the IVF cells
  (FAISS IVFPQ) exactly as ``e1_embedding_neardup_ivf`` composes cells with
  exact verification.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources import load_table

M, SUBDIM, K, N_QUERIES, TOPK = 4, 16, 16, 5, 3


def _l2sq(a, b):
    """Squared L2 distance between two equal-length double arrays, as a
    JVM-side fold (zip_with + aggregate) — PQ's native metric."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _subvectors(corpus: DataFrame) -> DataFrame:
    """(vec_id, emb[64]) → (vec_id, m, sub[16]): one row per subspace."""
    parts = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.slice("emb", m * SUBDIM + 1, SUBDIM).alias("sub"),
            )
            for m in range(M)
        ]
    )
    return corpus.select("vec_id", F.inline(parts))


def e2_pq_search_1round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed ANN, driver-checkable end-to-end.

    Train (1 Lloyd round/subspace) → encode (argmin code per subspace) →
    ADC search (per-query distance table + code equi-join + partial-sum
    groupBy). Queries are the first 5 vectors, ranked by approximate
    distance ascending with vec_id tie-break, top-3 each."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    subs = _subvectors(corpus)

    seeds = subs.filter(F.col("vec_id") < K).select(
        F.col("m").alias("sm"),
        F.col("vec_id").alias("cell"),
        F.col("sub").alias("s_sub"),
    )

    # One Lloyd round: nearest seed per (vector, subspace), then the
    # per-dimension mean of each (subspace, cell) group.
    w_argmin = Window.partitionBy("vec_id", "m").orderBy(
        F.asc("d6"), F.asc("cell")
    )
    assigned = (
        subs.join(F.broadcast(seeds), F.col("m") == F.col("sm"))
        .withColumn("d6", F.round(_l2sq(F.col("sub"), F.col("s_sub")), 6))
        .withColumn("rn", F.row_number().over(w_argmin))
        .filter(F.col("rn") == 1)
        .select("vec_id", "m", "sub", "cell")
    )
    cents0 = (
        assigned.select("m", "cell", F.posexplode("sub").alias("pos", "val"))
        .groupBy("m", "cell", "pos")
        .agg(F.avg("val").alias("v"))
        .groupBy("m", "cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("pv"))
        .select(
            "m",
            "cell",
            F.transform("pv", lambda s: F.round(s["v"], 6)).alias("c_sub"),
        )
    )
    # Empty cells keep their (rounded) seed subvector, as in the IVF twin.
    empty = (
        seeds.join(
            cents0,
            (seeds.sm == cents0.m) & (seeds.cell == cents0.cell),
            "left_anti",
        )
        .select(
            F.col("sm").alias("m"),
            "cell",
            F.transform("s_sub", lambda v: F.round(v, 6)).alias("c_sub"),
        )
    )
    cents = cents0.unionByName(empty).localCheckpoint(eager=False)

    # Encode: the corpus keeps only (vec_id, m, code) — the compressed form.
    codes = (
        subs.join(
            F.broadcast(cents.withColumnRenamed("m", "cm")),
            F.col("m") == F.col("cm"),
        )
        .withColumn("d6", F.round(_l2sq(F.col("sub"), F.col("c_sub")), 6))
        .withColumn("rn", F.row_number().over(w_argmin))
        .filter(F.col("rn") == 1)
        .select("vec_id", "m", F.col("cell").alias("code"))
    )

    # ADC: exact query-subvector → centroid distances (|q|×M×K rows).
    queries = subs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("m").alias("qm"),
        F.col("sub").alias("q_sub"),
    )
    dtab = queries.join(
        cents.withColumnRenamed("m", "cm"), F.col("qm") == F.col("cm")
    ).select(
        "query_id",
        F.col("qm").alias("m"),
        F.col("cell").alias("code"),
        F.round(_l2sq(F.col("q_sub"), F.col("c_sub")), 6).alias("d"),
    )

    w_rank = Window.partitionBy("query_id").orderBy(
        F.asc("adist"), F.asc("vec_id")
    )
    return (
        codes.join(F.broadcast(dtab), ["m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("d"), 4).alias("adist"))
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= TOPK)
    )


QUERIES = {"e2_pq_search_1round": e2_pq_search_1round}

_L2SQ = (
    "round(list_sum(list_transform(range(1, 17),"
    " j -> ({a}[j] - {b}[j]) * ({a}[j] - {b}[j]))), 6)"
)

ORACLES = {
    "e2_pq_search_1round": f"""
    WITH corpus AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        FROM embeddings
    ), subs AS (
        SELECT vec_id, mm.m AS m,
               list_slice(emb, mm.m * 16 + 1, mm.m * 16 + 16) AS sub
        FROM corpus CROSS JOIN (SELECT unnest(range(4)) AS m) mm
    ), seeds AS (
        SELECT m, vec_id AS cell, sub AS s_sub FROM subs WHERE vec_id < 16
    ), seed_d AS (
        SELECT s.vec_id, s.m, s.sub, sd.cell,
               {_L2SQ.format(a='s.sub', b='sd.s_sub')} AS d6
        FROM subs s JOIN seeds sd ON s.m = sd.m
    ), assigned AS (
        SELECT vec_id, m, sub, cell
        FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                           ORDER BY d6 ASC, cell ASC) AS rn
              FROM seed_d)
        WHERE rn = 1
    ), cent_dims AS (
        SELECT a.m, a.cell, jj.j, round(avg(a.sub[jj.j]), 6) AS v
        FROM assigned a CROSS JOIN (SELECT unnest(range(1, 17)) AS j) jj
        GROUP BY a.m, a.cell, jj.j
    ), cents0 AS (
        SELECT m, cell, list(v ORDER BY j) AS c_sub
        FROM cent_dims GROUP BY m, cell
    ), cents AS (
        SELECT m, cell, c_sub FROM cents0
        UNION ALL
        SELECT s.m, s.cell, list_transform(s.s_sub, v -> round(v, 6))
        FROM seeds s
        WHERE NOT EXISTS (SELECT 1 FROM cents0 c
                          WHERE c.m = s.m AND c.cell = s.cell)
    ), enc_d AS (
        SELECT s.vec_id, s.m, c.cell,
               {_L2SQ.format(a='s.sub', b='c.c_sub')} AS d6
        FROM subs s JOIN cents c ON s.m = c.m
    ), codes AS (
        SELECT vec_id, m, cell AS code
        FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                           ORDER BY d6 ASC, cell ASC) AS rn
              FROM enc_d)
        WHERE rn = 1
    ), queries AS (
        SELECT vec_id AS query_id, m, sub AS q_sub FROM subs WHERE vec_id < 5
    ), dtab AS (
        SELECT q.query_id, c.m, c.cell AS code,
               {_L2SQ.format(a='q.q_sub', b='c.c_sub')} AS d
        FROM queries q JOIN cents c ON q.m = c.m
    ), cand AS (
        SELECT d.query_id, co.vec_id, round(sum(d.d), 4) AS adist
        FROM codes co JOIN dtab d ON co.m = d.m AND co.code = d.code
        WHERE co.vec_id <> d.query_id
        GROUP BY d.query_id, co.vec_id
    )
    SELECT query_id, vec_id, adist,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY adist ASC, vec_id ASC) AS INT) AS rank
    FROM cand QUALIFY rank <= {TOPK}
    """,
}
