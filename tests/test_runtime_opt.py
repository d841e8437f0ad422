"""Runtime-optimization behaviors that matter at 100 TB but need explicit
conf thresholds to observe at test scale:

- runtime bloom-filter join pruning (Spark injects a bloom_filter_agg on
  the selective build side and a might_contain filter on the probe side,
  so the big fact scan drops non-joining rows BEFORE the shuffle);
- AQE skew-join splitting (a pathologically hot join key is split into
  multiple tasks at runtime instead of one straggler).

Both are conf-driven Catalyst/AQE features — the engine's job is to keep
plans in the shapes that let them fire (equi-joins on raw columns, no
UDF-wrapped keys), which is what these tests pin down.
"""

from __future__ import annotations

from contextlib import contextmanager

import pyspark.sql.functions as F

from caseguarddatapipeline_spark.sources import load_table


@contextmanager
def _confs(spark, **kv):
    old = {}
    try:
        for k, v in kv.items():
            key = k.replace("__", ".")
            try:
                old[key] = spark.conf.get(key)
            except Exception:
                old[key] = None
            spark.conf.set(key, v)
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    # selective dimension filter on orders → Spark builds a bloom filter
    # over o_orderkey and applies might_contain on the lineitem probe side
    # pre-shuffle. Thresholds lowered because test parquet is tiny; at
    # production scale the defaults (10 MB creation / 10 GB application)
    # fire on exactly this plan shape.
    with _confs(
        spark,
        **{
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    ):
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        q = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        opt = q._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in opt, opt
        phys = q._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in phys, phys
        # and it must not change results
        assert q.count() == 1


def test_aqe_splits_skewed_join_partition(spark, sf_dir):
    # 95% of fact rows share one join key — the classic hot-tenant shape
    # (SURVEY.md §2.2 P6). With skew thresholds scaled down to test data,
    # AQE must mark the sort-merge join's hot partition as skewed and
    # split it instead of leaving one straggler task.
    #
    # Two preconditions discovered the hard way (both are real-cluster
    # facts, not test artifacts):
    # 1. OptimizeSkewedJoin matches SMJ(Sort(ShuffleStage), Sort(...)) —
    #    an aggregation (e.g. distinct) between the shuffle and the join
    #    breaks the pattern, so skew relief only applies to plain
    #    shuffle-fed joins.
    # 2. A skewed partition is split along MAPPER output boundaries: a
    #    shuffle fed by one map task (here: one small parquet file → one
    #    scan partition) cannot be split at all. The .repartition(16)
    #    gives the join shuffle 16 mappers, mirroring a real cluster
    #    where thousands of map tasks feed each reduce partition.
    with _confs(
        spark,
        **{
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    ):
        li = load_table(spark, sf_dir, "lineitem").repartition(16)
        orders = load_table(spark, sf_dir, "orders").repartition(16)
        # funnel almost every row onto key 1; keep a spread of cold keys
        skewed = li.select(
            F.when(F.col("l_orderkey") % 20 != 0, F.lit(1))
            .otherwise(F.col("l_orderkey"))
            .alias("k"),
            "l_extendedprice",
        )
        dim = orders.select(F.col("o_orderkey").alias("k"), "o_totalprice")
        q = skewed.join(dim, "k")
        q.collect()  # AQE rewrites the plan during execution
        final = q._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final
        assert "skewed" in final.split("== Initial Plan ==")[0], final
