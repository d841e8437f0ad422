"""Versioned table store: immutable snapshots, atomic pointer, time
travel, retention, and diffing between versions."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from caseguarddatapipeline_spark.operators.contracts import (
    diff_summary,
    snapshot_diff,
)
from caseguarddatapipeline_spark.sources.versioned import (
    latest_version,
    read_latest,
    read_version,
    vacuum,
    write_version,
)


def _df(spark, n, bump=0.0):
    return spark.range(n).select(
        F.col("id"), (F.col("id") * 2 + bump).alias("val")
    )


def test_versioned_write_read_and_time_travel(spark, tmp_path):
    base = str(tmp_path / "t")
    assert write_version(_df(spark, 10), base) == 0
    assert write_version(_df(spark, 12), base) == 1
    assert write_version(_df(spark, 12, bump=0.5), base) == 2

    assert latest_version(base) == 2
    assert read_latest(spark, base).count() == 12
    assert read_version(spark, base, 0).count() == 10

    # versions are immutable inputs for reproducible runs: the diff
    # between two versions is exactly the mutation written between them
    s = diff_summary(
        snapshot_diff(
            read_version(spark, base, 1), read_version(spark, base, 2), ["id"]
        )
    )
    assert s == {"added": 0, "removed": 0, "changed": 12, "total_differing": 12}


def test_vacuum_retains_newest_and_pointer(spark, tmp_path):
    base = str(tmp_path / "t")
    for i in range(4):
        write_version(_df(spark, 5 + i), base)
    removed = vacuum(base, keep=2)
    assert removed == [0, 1]
    assert sorted(os.listdir(base)) == ["_LATEST", "v=2", "v=3"]
    assert read_latest(spark, base).count() == 8
    with pytest.raises(FileNotFoundError):
        read_version(spark, base, 0)
