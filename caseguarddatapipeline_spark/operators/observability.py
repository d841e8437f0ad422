"""Single-pass pipeline observability via observed metrics: counters and
sums computed ON the data flowing through a transformation, readable after
the action — no second scan, no accumulator races.

The reference counts admissions/rejections/bytes by incrementing Python
counters per row as it loops (docproc/extractor.py, etl/worker.py run
stats); in Spark the equivalent is ``DataFrame.observe``: the metrics ride
the SAME physical plan as the output (Spark's CollectMetrics node), so a
100 TB run gets its telemetry for free — the scan happens once, and the
numbers are exact even under task retries (unlike accumulators, which
double-count replayed tasks).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation

MIN_CHARS, MAX_CHARS = 60, 520  # document admission bounds (P4's gate)


def admit_documents_observed(docs: DataFrame) -> tuple[DataFrame, Observation]:
    """P4's admission filter with free telemetry: returns the admitted
    frame plus an Observation that, after any action on the result,
    yields total/admitted/rejected counts and admitted byte volume from
    the SAME pass. ``observe`` sits before the filter so rejected rows
    are counted, not silently dropped."""
    obs = Observation("admission")
    admitted_flag = (F.col("n_chars") >= MIN_CHARS) & (
        F.col("n_chars") <= MAX_CHARS
    )
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(admitted_flag, 1)).alias("n_admitted"),
        F.count(F.when(~admitted_flag, 1)).alias("n_rejected"),
        F.sum(F.when(admitted_flag, F.col("n_chars")).otherwise(0)).alias(
            "admitted_chars"
        ),
    )
    return observed.filter(admitted_flag), obs
