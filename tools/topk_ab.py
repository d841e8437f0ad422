"""One-off A/B: per-key top-2 on the 50x replicated lineitem corpus
(30 M rows) — row_number window vs ObjectHashAggregate top-k
(operators/topk.py). Counterbalanced order (W A A W A W) with the
same warmup discipline as stress_scale; prints per-variant timings.

Usage: python tools/topk_ab.py [replicas] [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from caseguarddatapipeline_spark.operators.topk import (  # noqa: E402
    topk_per_key,
    topk_per_key_window,
)
from caseguarddatapipeline_spark.session import get_spark  # noqa: E402
from caseguarddatapipeline_spark.sources import load_table  # noqa: E402
from tools.stress_scale import _replicate  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("topk-ab")
    li = load_table(spark, sf_dir, "lineitem")
    max_ok = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
    li_n = _replicate(li, ["l_orderkey"], n, max_ok).select(
        "l_orderkey", "l_extendedprice", "l_linenumber", "l_quantity"
    )

    order = [("l_extendedprice", True), ("l_linenumber", True)]

    def run_w():
        return (
            topk_per_key_window(li_n, ["l_orderkey"], order, 2)
            .agg(F.count(F.lit(1)), F.sum("l_quantity"))
            .collect()
        )

    def run_a():
        return (
            topk_per_key(li_n, ["l_orderkey"], order, 2)
            .agg(F.count(F.lit(1)), F.sum("l_quantity"))
            .collect()
        )

    # identity spot-check at full scale: counts+sums must agree
    rw, ra = run_w(), run_a()  # also serves as the JIT warmup
    assert [tuple(r) for r in rw] == [tuple(r) for r in ra], (rw, ra)
    print("identity ok:", rw[0])

    sched = [("W", run_w), ("A", run_a), ("A", run_a), ("W", run_w),
             ("A", run_a), ("W", run_w)]
    results: dict[str, list[float]] = {"W": [], "A": []}
    for label, fn in sched:
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        results[label].append(round(dt, 2))
        print(label, round(dt, 2), flush=True)
    rows = li_n.count()
    for label in ("W", "A"):
        best = min(results[label])
        print(
            f"{label}: runs={results[label]} best={best} "
            f"mrows/s={round(rows / best / 1e6, 3)}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
