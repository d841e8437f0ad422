"""Composed STREAMING corpus-assembly probe (round-9 verdict item 5):
drain a planted document corpus through streaming/assembly.py's
ingest → exact-dedup → near-dup → quality → budget → corpus pipeline
and record end-to-end docs/s plus the per-stage funnel, the streaming
counterpart of ASSEMBLY.json. Writes STREAM_ASSEMBLY.json; floor pinned
by tests/test_stream_assembly.py.

Corpus shape (per decade of doc_ids): 8 unique documents, one EXACT
copy of its predecessor (id%10==0 — the exact-dedup stage's work), one
NEAR-dup sharing 29/30 tokens with its predecessor (id%10==5 — the
signature probe's work). 30 tokens/doc over a 50-token hash-spread
vocabulary keeps every document inside the Gopher battery's bounds
(word count 20-90, mean word length 4.0-4.9, distinct ratio ≥ 0.45) so
the quality gate admits unique docs and the BUDGET stage is what
truncates — the same funnel the batch record proves.

Usage: python tools/assembly_stream_bench.py [n_docs=20000] [n_files=8]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from caseguarddatapipeline_spark.session import get_spark  # noqa: E402
from caseguarddatapipeline_spark.streaming.assembly import (  # noqa: E402
    run_assembly_stream,
)

# Round 13: adaptive budget decomposition + adaptive shuffle width +
# driver-held tallies took the 4-batch record to 4,936 docs/s and the
# new SINGLE-BATCH drain — the production-leaning configuration — to
# 19,252 docs/s end-to-end. marginal_docs_per_sec is now that direct
# single-batch rate (the old b2-b1 subtraction was a small difference
# of large numbers and swung 0-4 s run-to-run); its floor rises to
# 12,000 (~62% of measured). Overall floor stays at 2,500 (~50% of the
# noisier multi-batch configuration).
FLOORS = {"docs_per_sec": 2_500.0, "marginal_docs_per_sec": 12_000.0}


def planted_docs(spark, n_docs: int):
    """30-token docs; id%10==0 exact-copies its predecessor, id%10==5
    shares 29/30 tokens with its predecessor."""
    base = F.when(
        (F.col("id") % 10 == 0) | (F.col("id") % 10 == 5), F.col("id") - 1
    ).otherwise(F.col("id"))
    toks = [
        F.format_string(
            "tok%d", F.pmod(F.xxhash64(base, F.lit(i)), F.lit(50))
        )
        for i in range(30)
    ]
    # the near-dup variant perturbs only its LAST token
    toks[-1] = F.when(
        F.col("id") % 10 == 5,
        F.format_string(
            "tok%d", F.pmod(F.xxhash64(F.col("id"), F.lit(29)), F.lit(50))
        ),
    ).otherwise(toks[-1])
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *toks).alias("text")
    )


def main() -> int:
    import os
    import time as _t

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    budget = int(n_docs * 30 / 4 * 0.6)  # bites at ~60% of per-source flow
    # bounded settle-wait (same as bench.py): a hot box inflates the
    # single-shot drains 2x+ (measured round 11: 3,266 -> 1,576 docs/s
    # minutes apart on identical code at 1-min load 6)
    deadline = _t.time() + 180
    while _t.time() < deadline and os.getloadavg()[0] > 1.5:
        _t.sleep(5)
    spark = get_spark("assembly-stream-bench")
    # (measured, no win: shuffle_partitions=8 for the whole drain scored
    # 2558 docs/s vs wide runs at 2567-2941 at 50 k docs — inside
    # run-to-run variance at best, and the Arrow signature kernel wants
    # the width on 32 cores. Default width kept.)

    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as root:
        input_dir = f"{root}/in"
        work = f"{root}/work"
        # hash-partition on doc_id (not round-robin): rows→files is then a
        # pure function of the data, so batch composition — and with it
        # which member of a planted dup pair drains first — reproduces
        planted_docs(spark, n_docs).repartition(
            n_files, F.col("doc_id")
        ).write.mode("overwrite").json(input_dir)
        # warmup drain (JIT + Arrow worker spin-up) so neither measured
        # config pays the cold-session cost — the round-9 record mixed it
        # into the 4-batch run, understating the marginal throughput
        warm_in = f"{root}/warm_in"
        planted_docs(spark, 2_000).repartition(
            2, F.col("doc_id")
        ).write.mode("overwrite").json(warm_in)
        run_assembly_stream(
            spark, warm_in, f"{root}/warm_work", token_budget=budget
        )

        # fixed/marginal decomposition (round-10 verdict item 3, round
        # 13 third point): drain the SAME corpus at three batch counts
        # (1, b1, b2); the 100 TB extrapolation is the MARGINAL rate
        # (per-batch fixed cost amortizes to nothing at production
        # batch sizes), measured DIRECTLY by the single-batch drain.
        # Round 11: each config drains TWICE, interleaved, min per
        # config — a single-shot pair let one hot-box window poison the
        # numbers (observed: identical code measured b2 at 29 s and
        # 74 s an hour apart).
        b1, b2 = -(-n_files // 2), n_files
        assert b2 > b1, (
            f"need >= 2 input files to decompose fixed vs marginal "
            f"(n_files={n_files} gives b1=b2={b1})"
        )
        elapsed, elapsed_b2 = float("inf"), float("inf")
        elapsed_single = float("inf")
        for rep in range(2):
            t0 = time.perf_counter()
            run_assembly_stream(
                spark, input_dir, f"{root}/work_b1_{rep}",
                token_budget=budget, max_files_per_trigger=2,
            )
            elapsed = min(elapsed, time.perf_counter() - t0)
            t0 = time.perf_counter()
            run_assembly_stream(
                spark, input_dir, f"{root}/work_b2_{rep}",
                token_budget=budget, max_files_per_trigger=1,
            )
            elapsed_b2 = min(elapsed_b2, time.perf_counter() - t0)
            # single-batch drain (round 13): the whole corpus as ONE
            # micro-batch — the production-leaning batch size that the
            # fixed/marginal decomposition PREDICTS (fixed·1 +
            # marginal_sec); recording it makes the amortization claim
            # empirical instead of extrapolated
            t0 = time.perf_counter()
            run_assembly_stream(
                spark, input_dir, f"{root}/work_bs_{rep}",
                token_budget=budget, max_files_per_trigger=n_files,
            )
            elapsed_single = min(elapsed_single, time.perf_counter() - t0)
        # funnel/state assertions read the first B1 drain's output
        import shutil

        shutil.move(f"{root}/work_b1_0", work)
        # Decomposition (round 13 — third measured point): with the
        # single-batch drain in hand, elapsed is near-perfectly linear
        # in BATCH COUNT (least-squares slope over (1, b1, b2)), i.e.
        # per-trigger cost dominates and data-volume cost is small at
        # this corpus size. The old b2-b1 subtraction estimated the
        # marginal as a small difference of large numbers and swung
        # 0-4 s run-to-run; the single-batch drain now anchors it:
        # marginal_docs_per_sec is the DIRECT single-batch rate (a
        # strict lower bound on true marginal throughput — one trigger
        # fixed cost is still inside it), and the model
        # e(b) = slope*(b-1) + e_single reconstructs both multi-batch
        # drains (checked by tests/test_stream_assembly.py).
        pts = [(1, elapsed_single), (b1, elapsed), (b2, elapsed_b2)]
        mb = sum(p[0] for p in pts) / 3
        me = sum(p[1] for p in pts) / 3
        fixed_per_batch = max(
            0.0,
            sum((p[0] - mb) * (p[1] - me) for p in pts)
            / sum((p[0] - mb) ** 2 for p in pts),
        )
        marginal_sec = elapsed_single

        # stage ATTRIBUTION drain (round-11 verdict item 2): same corpus,
        # b1 config, each stage forced + timed driver-side. Not a timed
        # record (the forcing changes the schedule) — it names where the
        # marginal gap to the batch pipeline lives.
        stage_timings: list[dict] = []
        run_assembly_stream(
            spark, input_dir, f"{root}/work_attr", token_budget=budget,
            max_files_per_trigger=2, stage_timings=stage_timings,
        )
        stage_keys = [
            "admission_exact_dedup", "signature_kernel", "neardup_probe",
            "quality_budget", "state_writes",
        ]
        stage_sec = {
            k: round(sum(t[k] for t in stage_timings), 3) for k in stage_keys
        }
        attr_total = sum(stage_sec.values()) or 1.0

        corpus = spark.read.parquet(f"{work}/corpus")
        admitted = corpus.count()
        admitted_tokens = corpus.agg(F.sum("n_tokens")).collect()[0][0]
        per_source = {
            int(r["source"]): int(r["t"])
            for r in corpus.groupBy("source")
            .agg(F.sum("n_tokens").alias("t"))
            .collect()
        }
        hash_keys = spark.read.parquet(f"{work}/hash_index").count()
        sig_rows = spark.read.parquet(f"{work}/sig_index").count()
        # NOTE: the two drains' admitted corpora are NOT byte-identical —
        # batch composition decides which member of a same-batch dup pair
        # wins and when the budget bites — but the per-doc WORK (hashing,
        # signatures, probes) is, which is what the decomposition fits.

    doc = {
        "metric": "stream_corpus_assembly",
        "docs_in": n_docs,
        "batches": b1,
        "elapsed_sec": round(elapsed, 3),
        "docs_per_sec": round(n_docs / elapsed, 1),
        "decomposition": {
            "batches_b2": b2,
            "elapsed_b2_sec": round(elapsed_b2, 3),
            "fixed_sec_per_batch": round(fixed_per_batch, 3),
            "marginal_docs_per_sec": round(n_docs / marginal_sec, 1),
        },
        "single_batch": {
            "elapsed_sec": round(elapsed_single, 3),
            "docs_per_sec": round(n_docs / elapsed_single, 1),
            "note": "whole corpus as one micro-batch — the empirical "
                    "form of the fixed-cost amortization claim",
        },
        "stage_attribution": {
            "note": "forced-stage drain, diagnosis only (not the timed "
                    "record); seconds summed over batches",
            "sec": stage_sec,
            "share": {
                k: round(v / attr_total, 3) for k, v in stage_sec.items()
            },
        },
        "token_budget_per_source": budget,
        "funnel": {
            "unique_after_exact_dedup": hash_keys,
            "indexed_after_neardup": sig_rows // 4,  # 4 bands per doc
            "admitted_to_corpus": admitted,
            "admitted_tokens": int(admitted_tokens),
            "tokens_by_source": per_source,
        },
        "floors": FLOORS,
    }
    assert all(t <= budget for t in per_source.values()), "budget violated"
    Path(__file__).resolve().parent.parent.joinpath(
        "STREAM_ASSEMBLY.json"
    ).write_text(json.dumps(doc, indent=1) + "\n")
    print(json.dumps(doc))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
