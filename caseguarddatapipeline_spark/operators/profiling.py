"""Data-profiling aggregates: histograms, correlation, per-column
profiles — the nightly data-quality pass over a 100 TB lake (extends the
reference's monitoring/dashboard statistics, dashboard.py:243-286, to
column-level quality metrics).

All single-scan aggregations: the histogram is width_bucket + groupBy,
correlation uses Spark's built-in corr/covar partial aggregates, and the
column profile computes every column's metrics in ONE pass (no
per-column scans) then unpivots to long form.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources import load_table

HIST_LO, HIST_HI, HIST_BUCKETS = 0.0, 500000.0, 10


def a23_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order value: width_bucket + count per
    bucket, with bucket edges emitted for the chart-ready shape."""
    orders = load_table(spark, sf_dir, "orders")
    width = (HIST_HI - HIST_LO) / HIST_BUCKETS
    bucket = F.width_bucket(
        F.col("o_totalprice"), F.lit(HIST_LO), F.lit(HIST_HI), F.lit(HIST_BUCKETS)
    )
    return (
        orders.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "bucket",
            F.round(HIST_LO + (F.col("bucket") - 1) * width, 2).alias("lo_edge"),
            F.round(HIST_LO + F.col("bucket") * width, 2).alias("hi_edge"),
            "n_orders",
        )
    )


def a24_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pair statistics on lineitem: Pearson correlation, sample
    covariance, stddev — one partial+final aggregation pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.corr("l_discount", "l_tax"), 6).alias("corr_disc_tax"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "covar_qty_price"
        ),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("stddev_price"),
    )


PROFILE_COLS = ["o_totalprice", "o_custkey", "o_orderkey"]


def a25_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile (nulls, distincts, min/max/mean) for the
    numeric order columns — computed in ONE scan via a wide aggregation,
    then unpivoted to (column_name, metric rows)."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in PROFILE_COLS:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).cast("double").alias(f"{c}__n_null"),
            F.count_distinct(F.col(c)).cast("double").alias(f"{c}__n_distinct"),
            F.round(F.min(F.col(c)).cast("double"), 4).alias(f"{c}__min"),
            F.round(F.max(F.col(c)).cast("double"), 4).alias(f"{c}__max"),
            F.round(F.avg(F.col(c)), 4).alias(f"{c}__mean"),
        ]
    wide = orders.agg(*aggs)
    stack_cols = [f"{c}__{m}" for c in PROFILE_COLS
                  for m in ("n_null", "n_distinct", "min", "max", "mean")]
    long = wide.unpivot([], stack_cols, "col_metric", "value")
    return long.select(
        F.split("col_metric", "__").getItem(0).alias("column_name"),
        F.split("col_metric", "__").getItem(1).alias("metric"),
        "value",
    )


def a29_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations (the DLT-expectations /
    contract-test shape; extends the reference's admission checks,
    database/models.py constraints + docproc/format_config.py:86-145,
    to a named-rule report): key uniqueness, domain membership, range and
    null rules in ONE scan per table, referential integrity as one
    anti-join — each rule a (rule, n_checked, n_violations, passed) row
    so a pipeline can gate on `passed` per rule instead of failing
    opaquely. Per-row predicates compose into a single wide aggregate;
    nothing scans twice."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def _rule(name: str, n_checked, n_violations):
        return F.struct(
            F.lit(name).alias("rule"),
            n_checked.cast("long").alias("n_checked"),
            n_violations.cast("long").alias("n_violations"),
        )

    rules_o = (
        orders.agg(
            F.count(F.lit(1)).alias("n"),
            (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("dups"),
            F.count(
                F.when(
                    F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0), 1
                )
            ).alias("bad_price"),
            F.count(
                F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
            ).alias("bad_status"),
            F.count(F.when(F.col("o_orderdate").isNull(), 1)).alias("null_date"),
        )
        .select(
            F.explode(
                F.array(
                    _rule("orders.o_orderkey.unique", F.col("n"), F.col("dups")),
                    _rule("orders.o_totalprice.positive", F.col("n"),
                          F.col("bad_price")),
                    _rule("orders.o_orderstatus.in_domain", F.col("n"),
                          F.col("bad_status")),
                    _rule("orders.o_orderdate.not_null", F.col("n"),
                          F.col("null_date")),
                )
            ).alias("r")
        )
        .select("r.*")
    )
    # FK check folded into the same scan: LEFT equi-join to the key side,
    # orphans = rows whose parent key came back NULL — one join, one agg,
    # no single-row cross-products
    rules_l = (
        li.select("l_orderkey", "l_discount")
        .join(
            orders.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(
                F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
            ).alias("bad_discount"),
            F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias("orphans"),
        )
        .select(
            F.explode(
                F.array(
                    _rule("lineitem.l_discount.in_range", F.col("n"),
                          F.col("bad_discount")),
                    _rule("lineitem.l_orderkey.references_orders", F.col("n"),
                          F.col("orphans")),
                )
            ).alias("r")
        )
        .select("r.*")
    )
    return rules_o.unionByName(rules_l).withColumn(
        "passed", F.col("n_violations") == 0
    )


def a30_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection: median + MAD (median absolute
    deviation) and the count of values beyond the 3σ-equivalent robust
    fence (3 × 1.4826 × MAD) — the monitoring rule that survives the
    heavy-tailed metrics a mean/stddev z-score chokes on (dashboard.py's
    alert thresholds, made distribution-free). Two grouped exact-
    percentile aggregates on the same small key; the join back is
    broadcast (|event_type| rows). At 100 TB, swap both percentiles for
    the mergeable sketch (see approx_value_percentiles) — identical
    shape."""
    events = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = events.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = events.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad_raw")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.first("med"), 4).alias("median"),
            F.round(F.first("mad_raw"), 4).alias("mad"),
            F.count(
                F.when(F.col("adev") > 3 * 1.4826 * F.col("mad_raw"), 1)
            ).alias("n_outliers"),
        )
    )


def a31_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence with LIFT: for each unordered pair of
    event types, how much more often do they co-occur in one user's
    history than independence predicts — the association-mining /
    collaborative-filtering shape (lift = P(a∧b)/(P(a)·P(b)) over users).
    Per-user distinct types first (≤|type| rows per user), THEN the
    per-user pair self-join — candidate volume is Σ|types(u)|²/2 with
    |types| tiny, never |events|²; the base rates broadcast back (one
    row per type). Lift > 1 rows are the signal a recommender or a
    funnel designer reads."""
    events = load_table(spark, sf_dir, "events")
    ut = events.select("user_id", "event_type").distinct()
    n_users = ut.select("user_id").distinct().count()  # one scalar
    base = ut.groupBy(F.col("event_type").alias("t")).agg(
        F.count(F.lit(1)).alias("n_t")
    )
    a, b = ut.alias("a"), ut.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    enriched = (
        pairs.join(
            F.broadcast(base.select(F.col("t").alias("type_a"),
                                    F.col("n_t").alias("n_a"))),
            "type_a",
        )
        .join(
            F.broadcast(base.select(F.col("t").alias("type_b"),
                                    F.col("n_t").alias("n_b"))),
            "type_b",
        )
    )
    lift = (F.col("n_both") * F.lit(float(n_users))) / (
        F.col("n_a") * F.col("n_b")
    )
    return enriched.select(
        "type_a",
        "type_b",
        "n_both",
        "n_a",
        "n_b",
        F.round(lift, 6).alias("lift"),
    )


PSI_BINS = 6  # value bins of width 50, last bin open-ended


def psi_bin(value_col):
    """Fixed-width PSI bin of a value column — exact floor arithmetic,
    clamped to [0, PSI_BINS), shared by the batch operator and the
    streaming drift monitor so their histograms are comparable. The VALUE
    is clamped to the bin range BEFORE the divide/floor: flooring an
    extreme value/50 first returns BIGINT in Spark (overflow → ANSI
    error) but DOUBLE in DuckDB, and casting it saturates in one engine
    and raises in the other — clamped, both floor a small double and
    cast the same small integer."""
    clamped = F.least(
        F.greatest(value_col, F.lit(0.0)), F.lit(50.0 * (PSI_BINS - 1))
    )
    return F.floor(clamped / 50).cast("int")


def a32_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of
    the event stream's time range, per event type — the standard drift
    monitor a feature store / model-serving stack runs (PSI < 0.1 stable,
    0.1-0.25 moderate shift, > 0.25 drifted; extends the static alert
    thresholds of the reference's dashboard, monitoring/dashboard.py, to
    a distribution-level signal). ``value`` is binned into ``PSI_BINS``
    fixed-width buckets, each phase's bin shares are Laplace-smoothed
    (p = (n+1)/(N+bins), so an empty bin contributes a finite term
    instead of ln 0), and PSI = Σ (p−q)·ln(p/q).

    Determinism across engines: the time cutoff is the INTEGER midpoint
    of epoch-microsecond min/max ((min+max) DIV 2 — shift-invariant, so
    session-timezone offsets cancel), bins are exact floor arithmetic,
    and every float enters one explicitly-cast DOUBLE expression. One
    scan + two narrow aggregates; the bin spine is a 6-row broadcast per
    type, so the plan is two hash shuffles on (event_type[, bin, phase])
    keys regardless of event volume."""
    events = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        psi_bin(F.col("value")).alias("bin"),
    )
    # floor((min+max)/2): the sum (~3.4e15 µs) is exact in a double, and
    # FLOOR matches DuckDB's // — a bare cast would truncate here but
    # ROUND there, flipping the cutoff when the sum is odd
    cutoff = events.agg(
        F.floor((F.min("us") + F.max("us")) / F.lit(2)).cast("long").alias("cut")
    )
    binned = events.crossJoin(F.broadcast(cutoff)).select(
        "event_type",
        "bin",
        F.when(F.col("us") < F.col("cut"), "base").otherwise("curr").alias("phase"),
    )
    counts = binned.groupBy("event_type", "phase", "bin").agg(
        F.count(F.lit(1)).alias("n")
    )
    return psi_report(spark, counts)


def psi_report(spark: SparkSession, counts: DataFrame) -> DataFrame:
    """Smoothed PSI per event_type from (event_type, phase∈{base,curr},
    bin, n) counts — shared by the batch operator (phases = time halves)
    and the streaming drift monitor (base = a frozen baseline profile,
    curr = the accumulating stream). Missing (type, phase, bin)
    combinations count 0 via a broadcast spine, so Laplace smoothing sees
    all bins in both phases and an entirely-absent phase degrades to the
    uniform profile instead of dividing by zero."""
    spine = (
        counts.select("event_type").distinct()
        .crossJoin(
            F.broadcast(
                spark.range(PSI_BINS).select(F.col("id").cast("int").alias("bin"))
            )
        )
        .crossJoin(
            F.broadcast(spark.createDataFrame([("base",), ("curr",)], "phase string"))
        )
    )
    full = spine.join(counts, ["event_type", "phase", "bin"], "left").na.fill({"n": 0})
    tot = full.groupBy("event_type", "phase").agg(F.sum("n").alias("tot"))
    share = full.join(tot, ["event_type", "phase"]).select(
        "event_type",
        "bin",
        "phase",
        "n",
        (
            (F.col("n").cast("double") + F.lit(1.0))
            / (F.col("tot").cast("double") + F.lit(float(PSI_BINS)))
        ).alias("p"),
    )
    wide = (
        share.groupBy("event_type", "bin")
        .pivot("phase", ["base", "curr"])
        .agg(F.first("p").alias("p"), F.sum("n").alias("n"))
    )
    term = (F.col("base_p") - F.col("curr_p")) * F.log(
        F.col("base_p") / F.col("curr_p")
    )
    return (
        wide.groupBy("event_type")
        .agg(
            F.sum("base_n").cast("bigint").alias("n_base"),
            F.sum("curr_n").cast("bigint").alias("n_curr"),
            F.round(F.sum(term), 6).alias("psi"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "a32_psi_drift": a32_psi_drift,
    "a31_cooccurrence_lift": a31_cooccurrence_lift,
    "a23_value_histogram": a23_value_histogram,
    "a24_corr_stats": a24_corr_stats,
    "a25_data_profile": a25_data_profile,
    "a29_expectations": a29_expectations,
    "a30_robust_outliers": a30_robust_outliers,
}

ORACLES = {
    "a32_psi_drift": """
        WITH e AS (
            SELECT event_type, epoch_us(ts) AS us,
                   CAST(floor(least(greatest(value, CAST(0 AS DOUBLE)),
                                    CAST(250 AS DOUBLE)) / 50) AS INT) AS bin
            FROM events
        ), cut AS (
            SELECT (min(us) + max(us)) // 2 AS cut FROM e
        ), types AS (
            SELECT DISTINCT event_type FROM e
        ), spine AS (
            SELECT event_type, s.i AS bin, ph.phase
            FROM types,
                 LATERAL unnest(generate_series(0, 5)) AS s(i),
                 (VALUES ('base'), ('curr')) AS ph(phase)
        ), binned AS (
            SELECT event_type, bin,
                   CASE WHEN us < (SELECT cut FROM cut)
                        THEN 'base' ELSE 'curr' END AS phase
            FROM e
        ), counts AS (
            SELECT event_type, phase, bin, count(*) AS n
            FROM binned GROUP BY 1, 2, 3
        ), filled AS (
            SELECT sp.event_type, sp.phase, sp.bin, coalesce(c.n, 0) AS n
            FROM spine sp
            LEFT JOIN counts c USING (event_type, phase, bin)
        ), tot AS (
            SELECT event_type, phase, sum(n) AS tot
            FROM filled GROUP BY 1, 2
        ), share AS (
            SELECT f.event_type, f.bin, f.phase, f.n,
                   (CAST(f.n AS DOUBLE) + CAST(1 AS DOUBLE))
                   / (CAST(t.tot AS DOUBLE) + CAST(6 AS DOUBLE)) AS p
            FROM filled f JOIN tot t USING (event_type, phase)
        ), wide AS (
            SELECT event_type, bin,
                   max(CASE WHEN phase = 'base' THEN p END) AS base_p,
                   max(CASE WHEN phase = 'curr' THEN p END) AS curr_p,
                   sum(CASE WHEN phase = 'base' THEN n END) AS base_n,
                   sum(CASE WHEN phase = 'curr' THEN n END) AS curr_n
            FROM share GROUP BY 1, 2
        )
        SELECT event_type,
               CAST(sum(base_n) AS BIGINT) AS n_base,
               CAST(sum(curr_n) AS BIGINT) AS n_curr,
               round(sum((base_p - curr_p) * ln(base_p / curr_p)), 6) AS psi
        FROM wide GROUP BY event_type ORDER BY event_type
    """,
    "a31_cooccurrence_lift": """
        WITH ut AS (
            SELECT DISTINCT user_id, event_type FROM events
        ), base AS (
            SELECT event_type AS t, count(*) AS n_t FROM ut GROUP BY event_type
        ), total AS (
            SELECT count(DISTINCT user_id) AS n_users FROM ut
        ), pairs AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   count(*) AS n_both
            FROM ut a JOIN ut b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT type_a, type_b, n_both,
               ba.n_t AS n_a, bb.n_t AS n_b,
               round(n_both * CAST(n_users AS DOUBLE) / (ba.n_t * bb.n_t), 6)
                   AS lift
        FROM pairs
        JOIN base ba ON ba.t = type_a
        JOIN base bb ON bb.t = type_b
        CROSS JOIN total
    """,
    "a30_robust_outliers": """
        WITH med AS (
            SELECT event_type, quantile_cont(value, 0.5) AS med
            FROM events GROUP BY event_type
        ), dev AS (
            SELECT e.event_type, med.med,
                   abs(e.value - med.med) AS adev
            FROM events e JOIN med USING (event_type)
        ), mad AS (
            SELECT event_type, quantile_cont(adev, 0.5) AS mad_raw
            FROM dev GROUP BY event_type
        )
        SELECT event_type,
               count(*) AS n_events,
               round(any_value(med), 4) AS median,
               round(any_value(mad_raw), 4) AS mad,
               count(CASE WHEN adev > 3 * 1.4826 * mad_raw THEN 1 END)
                   AS n_outliers
        FROM dev JOIN mad USING (event_type)
        GROUP BY event_type
    """,
    "a29_expectations": """
        WITH o AS (
            SELECT count(*) AS n,
                   count(*) - count(DISTINCT o_orderkey) AS dups,
                   count(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
                              THEN 1 END) AS bad_price,
                   count(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                              THEN 1 END) AS bad_status,
                   count(CASE WHEN o_orderdate IS NULL THEN 1 END) AS null_date
            FROM orders
        ), l AS (
            SELECT count(*) AS n,
                   count(CASE WHEN l_discount < 0 OR l_discount > 1
                              THEN 1 END) AS bad_discount
            FROM lineitem
        ), orph AS (
            SELECT count(*) AS orphans FROM lineitem
            WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        ), rules AS (
            SELECT 'orders.o_orderkey.unique' AS rule,
                   n AS n_checked, dups AS n_violations FROM o
            UNION ALL SELECT 'orders.o_totalprice.positive', n, bad_price FROM o
            UNION ALL SELECT 'orders.o_orderstatus.in_domain', n, bad_status FROM o
            UNION ALL SELECT 'orders.o_orderdate.not_null', n, null_date FROM o
            UNION ALL SELECT 'lineitem.l_discount.in_range', n, bad_discount FROM l
            UNION ALL SELECT 'lineitem.l_orderkey.references_orders',
                             l.n, orph.orphans FROM l, orph
        )
        SELECT rule, CAST(n_checked AS BIGINT) AS n_checked,
               CAST(n_violations AS BIGINT) AS n_violations,
               n_violations = 0 AS passed
        FROM rules
    """,
    "a23_value_histogram": """
        WITH b AS (
            SELECT CAST(
                CASE WHEN o_totalprice < 0 THEN 0
                     WHEN o_totalprice >= 500000 THEN 11
                     ELSE floor(o_totalprice / 50000) + 1 END AS BIGINT) AS bucket
            FROM orders
        )
        SELECT bucket,
               round((bucket - 1) * 50000.0, 2) AS lo_edge,
               round(bucket * 50000.0, 2) AS hi_edge,
               count(*) AS n_orders
        FROM b GROUP BY bucket
    """,
    "a24_corr_stats": """
        SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
               round(corr(l_discount, l_tax), 6) AS corr_disc_tax,
               round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
               round(stddev_samp(l_extendedprice), 4) AS stddev_price
        FROM lineitem
    """,
    "a25_data_profile": """
        WITH wide AS (
            SELECT CAST(count(CASE WHEN o_totalprice IS NULL THEN 1 END) AS DOUBLE) AS a1,
                   CAST(count(DISTINCT o_totalprice) AS DOUBLE) AS a2,
                   round(CAST(min(o_totalprice) AS DOUBLE), 4) AS a3,
                   round(CAST(max(o_totalprice) AS DOUBLE), 4) AS a4,
                   round(avg(o_totalprice), 4) AS a5,
                   CAST(count(CASE WHEN o_custkey IS NULL THEN 1 END) AS DOUBLE) AS b1,
                   CAST(count(DISTINCT o_custkey) AS DOUBLE) AS b2,
                   round(CAST(min(o_custkey) AS DOUBLE), 4) AS b3,
                   round(CAST(max(o_custkey) AS DOUBLE), 4) AS b4,
                   round(avg(o_custkey), 4) AS b5,
                   CAST(count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS DOUBLE) AS c1,
                   CAST(count(DISTINCT o_orderkey) AS DOUBLE) AS c2,
                   round(CAST(min(o_orderkey) AS DOUBLE), 4) AS c3,
                   round(CAST(max(o_orderkey) AS DOUBLE), 4) AS c4,
                   round(avg(o_orderkey), 4) AS c5
            FROM orders
        )
        SELECT 'o_totalprice' AS column_name, 'n_null' AS metric, a1 AS value FROM wide
        UNION ALL SELECT 'o_totalprice', 'n_distinct', a2 FROM wide
        UNION ALL SELECT 'o_totalprice', 'min', a3 FROM wide
        UNION ALL SELECT 'o_totalprice', 'max', a4 FROM wide
        UNION ALL SELECT 'o_totalprice', 'mean', a5 FROM wide
        UNION ALL SELECT 'o_custkey', 'n_null', b1 FROM wide
        UNION ALL SELECT 'o_custkey', 'n_distinct', b2 FROM wide
        UNION ALL SELECT 'o_custkey', 'min', b3 FROM wide
        UNION ALL SELECT 'o_custkey', 'max', b4 FROM wide
        UNION ALL SELECT 'o_custkey', 'mean', b5 FROM wide
        UNION ALL SELECT 'o_orderkey', 'n_null', c1 FROM wide
        UNION ALL SELECT 'o_orderkey', 'n_distinct', c2 FROM wide
        UNION ALL SELECT 'o_orderkey', 'min', c3 FROM wide
        UNION ALL SELECT 'o_orderkey', 'max', c4 FROM wide
        UNION ALL SELECT 'o_orderkey', 'mean', c5 FROM wide
    """,
}
