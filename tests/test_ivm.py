"""Incremental view maintenance: delta-applied state equals the fresh
recompute through inserts, deletes, updates, and group retirement."""

from __future__ import annotations

import pyspark.sql.functions as F

from caseguarddatapipeline_spark.operators.ivm import build_state, refresh


def _canon(df):
    return sorted(
        (r.event_type, r.n_rows, round(r.total, 6)) for r in df.collect()
    )


def test_ivm_matches_recompute_through_version_chain(spark, sf_dir):
    from caseguarddatapipeline_spark.sources import load_table

    v0 = load_table(spark, sf_dir, "events").select("event_type", "value")
    # v1: delete a slice, update another slice, insert a new group
    v1 = (
        v0.filter(F.crc32(F.col("value").cast("string")) % 7 != 0)
        .withColumn(
            "value",
            F.when(F.col("event_type") == "view", F.col("value") + 1.0)
            .otherwise(F.col("value")),
        )
        .unionByName(
            spark.createDataFrame(
                [("new_type", 5.0), ("new_type", 7.0)], "event_type string, value double"
            )
        )
    )
    # v2: retire the new group entirely
    v2 = v1.filter(F.col("event_type") != "new_type")

    state0 = build_state(v0, ["event_type"], "value")
    state1 = refresh(state0, v0, v1, ["event_type"], "value")
    assert _canon(state1) == _canon(build_state(v1, ["event_type"], "value"))

    state2 = refresh(state1, v1, v2, ["event_type"], "value")
    assert _canon(state2) == _canon(build_state(v2, ["event_type"], "value"))
    # retired group is gone from the maintained view
    assert "new_type" not in {r[0] for r in _canon(state2)}

    # no-op delta: refreshing with identical versions changes nothing
    state2b = refresh(state2, v2, v2, ["event_type"], "value")
    assert _canon(state2b) == _canon(state2)
