"""Incremental view maintenance (IVM): keep a grouped count/sum aggregate
current by applying the DELTA between two table versions instead of
recomputing over the full table.

Complements t13_incremental_rollup (which merges closed partitions with an
open tail — the time-partitioned special case): this is the general
retract-capable form. Count and sum are ABELIAN — every change commutes —
so the maintenance algebra is:

    delta      = after ⊎ (−1 · before)          (union with a sign column)
    new_state  = old_state ⊕ groupBy(delta)     (outer join + coalesced add)

which handles inserts, deletes, AND in-place updates in one pass, and
costs O(|changed rows| + |groups|) — at 100 TB the delta side is the
day's churn, not the table. Groups whose count returns to zero drop out,
so the maintained view is exactly the view a fresh groupBy would build
(pinned by tests against the recompute).

Non-decomposable aggregates (exact distinct, exact median) need either a
sketch (a16's HLL merges; approx_value_percentiles' KLL merges) or the
recompute path — the same routing every IVM system documents.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def build_state(table: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Materialize the maintained view: per-key count and sum.

    The measure is canonicalized to ``coalesce(sum(double), 0.0)`` so the
    maintained state and a fresh recompute agree by DEFINITION: without
    it, an all-NULL group recomputes to total=NULL while delta
    maintenance produces 0.0, and an integer measure's schema would
    silently widen to double on the first refresh (coalesce in
    apply_delta) — both would break the pinned equivalence."""
    return table.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.sum(F.col(value_col).cast("double")), F.lit(0.0)).alias(
            "total"
        ),
    )


def version_delta(
    before: DataFrame, after: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Signed per-key delta between two table versions: +1 rows from
    ``after``, −1 rows from ``before``; identical rows cancel inside the
    aggregate, so the output holds only keys whose contribution moved."""
    signed = after.select(*keys, value_col, F.lit(1).alias("sign")).unionByName(
        before.select(*keys, value_col, F.lit(-1).alias("sign"))
    )
    return (
        signed.groupBy(*keys)
        .agg(
            F.sum("sign").alias("d_rows"),
            # same canonical double measure as build_state; NULL values
            # contribute 0 (they never contributed to `total` either)
            F.coalesce(
                F.sum(F.col(value_col).cast("double") * F.col("sign")),
                F.lit(0.0),
            ).alias("d_total"),
        )
        .filter((F.col("d_rows") != 0) | (F.col("d_total") != 0))
    )


def apply_delta(state: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """new_state = state ⊕ delta: full-outer join on the keys, coalesced
    addition, zero-count groups retired."""
    merged = state.join(delta, keys, "full_outer").select(
        *keys,
        (F.coalesce(F.col("n_rows"), F.lit(0))
         + F.coalesce(F.col("d_rows"), F.lit(0))).alias("n_rows"),
        (F.coalesce(F.col("total"), F.lit(0.0))
         + F.coalesce(F.col("d_total"), F.lit(0.0))).alias("total"),
    )
    return merged.filter(F.col("n_rows") > 0)


def refresh(
    state: DataFrame,
    before: DataFrame,
    after: DataFrame,
    keys: list[str],
    value_col: str,
) -> DataFrame:
    """One maintenance step: advance ``state`` from version ``before`` to
    version ``after``."""
    return apply_delta(state, version_delta(before, after, keys, value_col), keys)
