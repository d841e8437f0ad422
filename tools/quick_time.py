"""Focused bench-condition timer for named queries: warm cache, low
latency profile, per-query DOP from bench._DOP, 2 warmups + min-of-7
noop-sink runs (plan rebuild included). Usage:
    python tools/quick_time.py q1 q2 ...
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

from bench import _DOP, _DOP_DEFAULT  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("quick-time")
    queries, _ = build_catalog()
    enable_warm_cache(min(8, cpus))
    enable_low_latency(spark, shuffle_partitions=min(4, cpus))
    for t in ("lineitem", "orders", "customer", "events", "documents",
              "embeddings", "part", "supplier", "nation", "region"):
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
    for name in names:
        fn = queries[name]
        spark.conf.set("spark.sql.shuffle.partitions",
                       str(min(_DOP.get(name, _DOP_DEFAULT), cpus)))
        for _ in range(3):
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(7):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        print(f"{name:38s} min={min(samples)*1000:6.1f}ms "
              f"med={sorted(samples)[len(samples)//2]*1000:6.1f}ms")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
