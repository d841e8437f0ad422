"""Composed end-to-end corpus-assembly stress record (round-8 verdict
item 4): ONE chained run — exact dedup → LSH near-dup removal → Gopher
rule battery → utility-weighted mixture plan → per-source token-budget
admission → sequence packing → sharded parquet write — on the
N×-replicated document corpus, with a per-stage wall-clock breakdown.

Every stage is the COMMITTED operator body (imported, not re-derived), so
this measures the composition the individual stress shapes only measure
in isolation: no driver-side seam except the two scalars a real pipeline
also materializes (the survivor token total that sizes the budget, and
the weighted water-level λ pair, both #sources-row aggregates).

Stage outputs that feed multiple consumers are persisted — the posture a
real multi-stage assembly job has (each stage checkpointed to the lake);
per-stage seconds are the time to MATERIALIZE that stage given its
persisted predecessor, so they sum to the pipeline's critical path.

Usage: python tools/assembly_bench.py [replicas] [sf_dir]
Writes ASSEMBLY.json at the repo root (committed record is the 50× run);
tests/test_scale_floor.py pins the floors.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from caseguarddatapipeline_spark.session import get_spark  # noqa: E402
from caseguarddatapipeline_spark.sources import load_table  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from caseguarddatapipeline_spark.operators.curation import (
        SEQ_LEN,
        weighted_mixture_plan,
    )
    from caseguarddatapipeline_spark.operators.dedup import (
        _band_pairs,
        _banded_vectorized,
        _portable_token_hash,
    )
    from caseguarddatapipeline_spark.operators.quality import (
        MAX_MEAN_WLEN,
        MAX_WORDS,
        MIN_DISTINCT_RATIO,
        MIN_MEAN_WLEN,
        MIN_WORDS,
    )
    from caseguarddatapipeline_spark.operators.textops import STOPWORDS

    spark = get_spark("assembly-bench")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    # same boilerplate-skewed replication as tools/stress_scale.py's
    # docs_bp: replica siblings share a boilerplate head and differ by a
    # tail token, so they are NEAR- but not exact duplicates — the exact
    # stage passes the full corpus through and the LSH stage does the
    # real collapse, i.e. every stage of the chain works at 50×
    boiler = "boiler alpha beta gamma delta epsilon zeta eta theta iota"
    docs_n = (
        docs.select(
            "doc_id", "text", "source",
            F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("rep"),
        )
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(max_doc)).alias("doc_id"),
            F.concat(
                F.lit(boiler + " "),
                F.col("text"),
                F.lit(" rep"),
                F.col("rep").cast("string"),
            ).alias("text"),
            "source",
        )
    )
    n_in = docs_n.count()

    stages: dict[str, dict[str, float]] = {}

    def stage(name: str, df, persist: bool = True):
        if persist:
            df = df.persist()
        t0 = time.perf_counter()
        rows = df.count()
        sec = time.perf_counter() - t0
        stages[name] = {"sec": round(sec, 3), "rows_out": rows}
        print(f"{name}: {sec:.2f}s -> {rows} rows", flush=True)
        return df

    t_total0 = time.perf_counter()

    # 1. exact dedup: keep the lowest doc_id per identical text
    rn = F.row_number().over(
        Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    )
    exact = stage(
        "exact_dedup",
        docs_n.withColumn("rn", rn).filter(F.col("rn") == 1).drop("rn"),
    )

    # 2. LSH near-dup removal over the exact-unique survivors (the
    # committed MinHash kernel + bucket tail; drop higher-id pair members)
    pairs = _band_pairs(
        _banded_vectorized(spark, exact.select("doc_id", "text")),
        dedup_pairs=False,
    )
    removals = (
        pairs.filter(F.col("jaccard") >= 0.5)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    deduped = stage("lsh_neardup", exact.join(removals, "doc_id", "left_anti"))
    exact.unpersist()

    # 3. Gopher rule battery (same algebra as e3_gopher_rules, inlined on
    # the SURVIVORS rather than the raw table — the composition point)
    toks = F.split(F.col("text"), " ")
    n_words = F.size(toks)
    mean_wlen = (F.length("text") - (n_words - 1)).cast("double") / n_words
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_words
    passed = (
        (n_words >= MIN_WORDS)
        & (n_words <= MAX_WORDS)
        & (mean_wlen >= MIN_MEAN_WLEN)
        & (mean_wlen <= MAX_MEAN_WLEN)
        & (distinct_ratio >= MIN_DISTINCT_RATIO)
        & F.arrays_overlap(toks, F.array(*[F.lit(s) for s in STOPWORDS]))
    )
    flagged = stage(
        "gopher_battery",
        deduped.select(
            "doc_id",
            "text",
            "source",
            F.size(
                F.filter(F.split(F.col("text"), " "), lambda t: t != "")
            ).alias("n_tokens"),
            passed.alias("passed"),
        ),
    )
    deduped.unpersist()
    survivors = flagged.filter(F.col("passed"))

    # 4. utility-weighted mixture plan over the survivors: budget = 40%
    # of the survivor token supply (a real assembly's externally-set
    # target), utility = add-one-smoothed per-source pass rate measured
    # on the PRE-filter battery output
    per_source = (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("passed"), F.col("n_tokens")).otherwise(0))
            .cast("long")
            .alias("t"),
            F.sum(F.when(F.col("passed"), 1).otherwise(0)).alias("n_pass"),
        )
        .select(
            "source",
            "n_docs",
            "t",
            F.expr(
                "(2 * 1000000 * (n_pass + 1) + (n_docs + 1))"
                " DIV (2 * (n_docs + 1))"
            ).alias("u6"),
        )
    )
    budget = int(
        survivors.agg(F.sum("n_tokens")).collect()[0][0] * 2 // 5
    )
    plan = stage(
        "weighted_mixture", weighted_mixture_plan(per_source, budget)
    )

    # 5. per-source token-budget admission: stable content-hash order,
    # running sum <= the source's weighted allocation (the committed
    # admission rule of the token-budget samplers)
    h = F.pmod(_portable_token_hash(F.col("text")), F.lit(1_000_000))
    w_adm = (
        Window.partitionBy("source")
        .orderBy(F.col("h").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    admitted = stage(
        "token_budget",
        survivors.withColumn("h", h)
        .withColumn("cum", F.sum("n_tokens").over(w_adm))
        .join(
            F.broadcast(plan.select("source", "alloc_tokens")), "source"
        )
        .filter(F.col("cum") <= F.col("alloc_tokens"))
        .select("doc_id", "text", "source", "n_tokens"),
    )
    flagged.unpersist()

    # 6. sequence packing: per-source concat-and-chunk into SEQ_LEN bins
    w_pack = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = stage(
        "sequence_pack",
        admitted.withColumn(
            "bin_id",
            F.floor(
                (F.sum("n_tokens").over(w_pack) - F.col("n_tokens"))
                / SEQ_LEN
            ),
        )
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        ),
        persist=False,
    )

    # 7. sharded write: the admitted corpus lands partitioned by source
    out_dir = tempfile.mkdtemp(prefix="caseguard-assembly-")
    t0 = time.perf_counter()
    admitted.write.mode("overwrite").partitionBy("source").parquet(out_dir)
    sec = time.perf_counter() - t0
    n_shard_rows = spark.read.parquet(out_dir).count()
    stages["sharded_write"] = {"sec": round(sec, 3), "rows_out": n_shard_rows}
    print(f"sharded_write: {sec:.2f}s -> {n_shard_rows} rows", flush=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    admitted.unpersist()
    plan.unpersist()

    total = time.perf_counter() - t_total0
    doc = {
        "metric": "corpus_assembly",
        "replicas": n,
        "n_docs_in": n_in,
        "budget_tokens": budget,
        "stages": stages,
        "total_sec": round(total, 3),
        "docs_per_sec": round(n_in / total, 1),
        "floors": FLOORS,
    }
    if n >= 50:
        record = Path(__file__).resolve().parent.parent / "ASSEMBLY.json"
        record.write_text(json.dumps(doc, indent=1) + "\n")
    print(json.dumps(doc))
    spark.stop()
    return 0


# Committed-record floors (50×, 250 k docs in, local[32]): total
# throughput and the stage list — a regression in ANY stage shows up in
# total docs/s; the per-stage breakdown localizes it. Floor ≈ 1/3 of the
# measured rate so box noise can't trip it but a lost kernel, a new
# quadratic, or a collapsed window sort will.
FLOORS = {"docs_per_sec": 2500.0}


if __name__ == "__main__":
    raise SystemExit(main())
