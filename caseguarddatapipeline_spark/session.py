"""SparkSession factory tuned for the engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); the same
configuration scales to a multi-executor cluster because nothing here is
local-mode-specific: AQE handles runtime re-planning (partition coalescing,
skew-join splitting), shuffle partitioning is explicit, and Arrow transfer is
enabled for the pandas-UDF inference operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are safe (and required) to apply to an externally provided
# session at runtime — e.g. the verify driver's own SparkSession.
RUNTIME_CONFS: dict[str, str] = {
    # events.parquet stores INT64 TIMESTAMP(NANOS) which Spark's parquet
    # reader rejects by default; read as long and cast in the loader.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic wall-clock-free semantics + DuckDB-oracle parity for
    # naive timestamps.
    "spark.sql.session.timeZone": "UTC",
    # Adaptive execution: runtime shuffle coalescing + skew-join splitting.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to any session (ours or the driver's)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # A conf may be static in some deployments; never fail a query
            # because a tuning knob could not be applied.
            pass
    return spark


def get_spark(
    app_name: str = "caseguarddatapipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's configuration."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # One shuffle partition per core locally; on a real cluster this is
        # overridden to ~2-3x total cores (AQE coalesces the excess).
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return apply_runtime_confs(spark)
