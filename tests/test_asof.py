"""As-of join semantics on constructed data: latest at-or-before match,
no-match nulls, same-instant inclusion, deterministic tie-break."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window


def _asof(spark, events_rows, orders_rows):
    # mirror t10_asof_join's union+window composition on tiny frames
    from datetime import datetime

    def conv(rows):
        return [
            (k, datetime.strptime(t, "%Y-%m-%d %H:%M:%S"), x)
            for k, t, x in rows
        ]

    ev = spark.createDataFrame(
        conv(events_rows), "k long, t timestamp_ntz, event_id long"
    )
    od = spark.createDataFrame(
        conv(orders_rows), "k long, t timestamp_ntz, o_orderkey long"
    )
    left = ev.select(
        "k", "t", "event_id", F.lit(1).alias("is_left"),
        F.lit(None).cast("bigint").alias("o_orderkey"),
    )
    right = od.select(
        "k", "t", F.lit(None).cast("bigint").alias("event_id"),
        F.lit(0).alias("is_left"), "o_orderkey",
    )
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("t").asc(), F.col("is_left").asc(),
                 F.col("o_orderkey").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return {
        r["event_id"]: r["m"]
        for r in left.unionByName(right)
        .withColumn("m", F.last("o_orderkey", ignorenulls=True).over(w))
        .filter(F.col("is_left") == 1)
        .collect()
    }


def test_asof_core_semantics(spark):
    got = _asof(
        spark,
        [
            (1, "2024-01-01 00:00:00", 100),  # before any order -> null
            (1, "2024-01-05 12:00:00", 101),  # after order 10 -> 10
            (1, "2024-01-10 00:00:00", 102),  # same instant as 20 -> 20
            (1, "2024-03-01 00:00:00", 103),  # latest overall -> 20
            (2, "2024-01-06 00:00:00", 200),  # other key isolated -> 30
        ],
        [
            (1, "2024-01-05 00:00:00", 10),
            (1, "2024-01-10 00:00:00", 20),
            (2, "2024-01-02 00:00:00", 30),
        ],
    )
    assert got == {100: None, 101: 10, 102: 20, 103: 20, 200: 30}


def test_asof_tie_breaks_by_highest_orderkey(spark):
    got = _asof(
        spark,
        [(1, "2024-01-05 00:00:00", 100)],
        [(1, "2024-01-05 00:00:00", 7), (1, "2024-01-05 00:00:00", 9)],
    )
    assert got == {100: 9}
