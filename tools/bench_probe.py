"""One-off probe: per-query breakdown of plan-construction vs execution
time, and job/stage counts, for the bench headliners. Not part of the
driver contract — a tuning aid for the bench target.

Usage: python tools/bench_probe.py [shuffle_partitions] [warm_partitions]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from caseguarddatapipeline_spark.catalog import build_catalog  # noqa: E402
from caseguarddatapipeline_spark.session import enable_low_latency, get_spark  # noqa: E402
from caseguarddatapipeline_spark.sources import load_table  # noqa: E402
from caseguarddatapipeline_spark.sources.tables import enable_warm_cache  # noqa: E402

from bench import BENCH_QUERIES  # noqa: E402


def main() -> int:
    shuffle = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    warm = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-probe")
    for kv in os.environ.get("PROBE_CONFS", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            spark.conf.set(k, v)
    queries, _ = build_catalog()
    enable_warm_cache(warm)
    enable_low_latency(spark, shuffle_partitions=shuffle)
    for t in ("lineitem", "orders", "customer", "events", "documents",
              "embeddings", "part", "supplier", "nation", "region"):
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
    for name in BENCH_QUERIES:
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    total_build = total_exec = 0.0
    print(f"shuffle={shuffle} warm={warm}")
    for name in BENCH_QUERIES:
        fn = queries[name]
        for _ in range(2):
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        bbuild = bexec = float("inf")
        jobs = 0
        for _ in range(5):
            j0 = tracker.getJobIdsForGroup(None)
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            bbuild = min(bbuild, t1 - t0)
            bexec = min(bexec, t2 - t1)
            jobs = len(sc.statusTracker().getJobIdsForGroup(None)) - len(j0)
        total_build += bbuild
        total_exec += bexec
        print(f"{name:38s} build={bbuild*1000:6.1f}ms exec={bexec*1000:6.1f}ms jobs={jobs}")
    print(f"{'TOTAL':38s} build={total_build*1000:6.1f}ms exec={total_exec*1000:6.1f}ms "
          f"sum={(total_build+total_exec):.3f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
