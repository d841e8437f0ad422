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


# Sessions switched to the interactive-serving profile (by applicationId —
# object ids can be REUSED by a new session after the old one is GC'd,
# which would silently skip AQE confs for an unrelated session): for
# these, apply_runtime_confs must not re-assert the batch AQE defaults.
_LOW_LATENCY_SESSIONS: set[str] = set()


def _session_tag(spark: SparkSession) -> str:
    try:
        return spark.sparkContext.applicationId
    except Exception:
        return f"id:{id(spark)}"


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to any session (ours or the driver's)."""
    skip_adaptive = _session_tag(spark) in _LOW_LATENCY_SESSIONS
    for k, v in RUNTIME_CONFS.items():
        if skip_adaptive and k.startswith("spark.sql.adaptive."):
            continue
        try:
            spark.conf.set(k, v)
        except Exception:
            # A conf may be static in some deployments; never fail a query
            # because a tuning knob could not be applied.
            pass
    return spark


def enable_low_latency(spark: SparkSession, shuffle_partitions: int = 8) -> SparkSession:
    """Switch a session to the interactive-serving profile.

    AQE inserts a materialization + re-optimization barrier after every
    exchange; that re-plan buys back far more than it costs on 100 GB+
    shuffles (coalescing, skew splits) but adds a fixed ~30-80 ms per
    stage, which dominates sub-second queries. Engines make the same
    trade adaptively (e.g. cost-based re-opt thresholds); here it is an
    explicit profile: batch/ETL sessions keep the AQE defaults from
    ``RUNTIME_CONFS``, dashboards/bench serving small scale factors call
    this. Fewer shuffle partitions likewise trade task-launch overhead
    for per-task size — correct when shuffles are MBs, not GBs.
    """
    _LOW_LATENCY_SESSIONS.add(_session_tag(spark))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return spark


def disable_low_latency(spark: SparkSession) -> SparkSession:
    """Return a session to the batch/ETL profile (AQE defaults)."""
    _LOW_LATENCY_SESSIONS.discard(_session_tag(spark))
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))),
    )
    return apply_runtime_confs(spark)


def _default_driver_mem() -> str:
    """Driver-heap default: min(24g, ~25% of physical RAM), floor 2g.

    24g is the measured requirement for the 50x stress corpus on the
    128 GiB reference box (heap backs all 32 local-mode task threads);
    a 16 GiB laptop or CI runner gets 4g instead of an OS-OOM-inviting
    24g. SPARK_DRIVER_MEM overrides unconditionally.
    """
    try:
        total = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
    except (ValueError, OSError, AttributeError):
        return "8g"
    quarter_gib = total // (4 * 1024**3)
    return f"{max(2, min(24, quarter_gib))}g"


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
        # FAIR scheduling: concurrent serving threads (multi-tenant
        # requests against one session) share the cluster round-robin by
        # pool instead of FIFO head-of-line blocking; see scheduler_pool.
        .config("spark.scheduler.mode", "FAIR")
        # Local mode: the driver JVM IS the executor, so its heap backs
        # all 32 task threads' execution memory at once. 8g starved the
        # 50x stress corpus the moment an Arrow stage joined the shuffle
        # pipeline (TaskMemoryManager page-allocation failures → GCLocker
        # thrash → Python workers killed); 24g leaves ~100 GiB for page
        # cache + the 32 Python workers on a 128 GiB box. The default is
        # capped at ~25% of physical RAM so smaller dev/CI hosts don't
        # inherit an oversized heap (SPARK_DRIVER_MEM overrides either
        # way); on a real cluster this is per-executor sizing.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", _default_driver_mem()))
        # Bound the per-task Arrow transfer buffer: with 32 concurrent
        # tasks, the 64 MiB default admits 2 GiB of simultaneous batch
        # pages JUST for Python-stage input — and rows carrying document
        # shingle arrays (the set-similarity verify kernel) hit the byte
        # bound long before the 10k-row bound. 16 MiB keeps worst-case
        # concurrent batch memory at 512 MiB with no measurable kernel
        # overhead (batches stay thousands of rows).
        .config("spark.sql.execution.arrow.maxBytesPerBatch", "16m")
        # Executor↔python-worker transport over unix domain sockets
        # (Spark 4): shaves ~30 ms of per-task handshake off every
        # Python-stage query (measured 0.206→0.177 s on an identity
        # mapInPandas); same-host communication in any deployment.
        .config("spark.python.unix.domain.socket.enabled", "true")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return apply_runtime_confs(spark)


from contextlib import contextmanager


@contextmanager
def scheduler_pool(spark: SparkSession, pool: str):
    """Run the enclosed actions in a named FAIR-scheduler pool.

    Multi-tenant serving shares ONE session across request threads;
    Spark's scheduler pools stop a tenant's heavy query from starving
    another's interactive one. The pool assignment is a THREAD-LOCAL
    property, so each serving thread wraps its work in this context and
    concurrent tenants schedule fairly (requires the session built with
    ``spark.scheduler.mode=FAIR`` — get_spark sets it; in the default
    FIFO mode the property is accepted and simply has no effect, so the
    code path is deployment-agnostic)."""
    sc = spark.sparkContext
    prev = sc.getLocalProperty("spark.scheduler.pool")
    sc.setLocalProperty("spark.scheduler.pool", pool)
    try:
        yield
    finally:
        sc.setLocalProperty("spark.scheduler.pool", prev)
