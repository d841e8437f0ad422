"""Scale-up stress probe: run the headline plan shapes on an N×-replicated
fact table (default 10× sf0.1 ≈ 6 M lineitem rows) under the BATCH profile
(AQE on) and report throughput.

The bench at sf0.1 measures per-query constants (see README); this probe
answers the complementary question — what happens when data dominates?
Replication multiplies the provided parquet in-memory (crossJoin with a
replica index, keys offset per replica so key cardinality scales with the
data, as a real larger corpus would); no synthetic files are written.

Usage: python tools/stress_scale.py [replicas] [sf_dir]
Prints one JSON line: rows, seconds and Mrows/s per shape.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from caseguarddatapipeline_spark.session import get_spark  # noqa: E402
from caseguarddatapipeline_spark.sources import load_table  # noqa: E402


def _replicate(df, key_cols: list[str], n: int, max_key):
    """n copies with per-replica key offsets (cardinality scales with data)."""
    reps = F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("rep")
    out = df.select("*", reps)
    for k in key_cols:
        out = out.withColumn(k, F.col(k) + F.col("rep") * F.lit(max_key))
    return out.drop("rep")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("stress")

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    max_ok = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    li_n = _replicate(li, ["l_orderkey"], n, max_ok)
    orders_n = _replicate(orders, ["o_orderkey"], n, max_ok)

    shapes = {
        # q1 shape: scan + filter + 2-key groupBy (map-side combinable)
        "agg_scan": lambda: li_n.filter(F.col("l_shipdate") <= "1998-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            F.count(F.lit(1)),
        ),
        # q18 shape: fact groupBy + fact-fact join (both sides scale)
        "join_agg": lambda: li_n.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .join(orders_n, F.col("l_orderkey") == F.col("o_orderkey"))
        .agg(F.count(F.lit(1)), F.sum("o_totalprice")),
        # window shape: per-key ranking at scaled key cardinality
        "window_topk": lambda: li_n.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("l_orderkey")
                .orderBy(F.desc("l_extendedprice"))
            ),
        )
        .filter(F.col("rn") <= 2)
        .agg(F.count(F.lit(1))),
    }

    rows = li_n.count()
    out: dict[str, dict[str, float]] = {}
    for name, build in shapes.items():
        build().write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = {
            "sec": round(best, 3),
            "mrows_per_sec": round(rows / best / 1e6, 1),
        }
    print(
        json.dumps(
            {
                "metric": "stress_scale",
                "replicas": n,
                "fact_rows": rows,
                "shapes": out,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
