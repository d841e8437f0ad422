"""TableFormat contract suite (round-9 verdict item 4): every registered
implementation must pass the same write/read/time-travel/merge/vacuum
assertions — the proof that call sites programmed against the interface
survive an adapter swap. The sandbox registers the bespoke versioned
store; a Delta/Iceberg adapter added later is proven by adding one
fixture param."""

from __future__ import annotations

import pytest


@pytest.fixture(params=["versioned"])
def fmt(request, tmp_path):
    if request.param == "versioned":
        from caseguarddatapipeline_spark.sources.tableformat import (
            VersionedStoreFormat,
        )

        return VersionedStoreFormat(str(tmp_path / "tbl"))
    if request.param == "delta":  # pragma: no cover - no delta in sandbox
        pytest.importorskip("delta")
        from caseguarddatapipeline_spark.sources.tableformat import (
            DeltaTableFormat,
        )

        return DeltaTableFormat(str(tmp_path / "tbl"))
    raise AssertionError(request.param)


def _df(spark, rows):
    return spark.createDataFrame(rows, "entity_id long, val string")


def test_write_read_roundtrip_and_versions(spark, fmt):
    v1 = fmt.write(_df(spark, [(1, "a"), (2, "b")]))
    v2 = fmt.write(_df(spark, [(1, "a2"), (3, "c")]))
    assert v2 > v1
    assert fmt.latest_version() == v2
    latest = {r.entity_id: r.val for r in fmt.read_latest(spark).collect()}
    assert latest == {1: "a2", 3: "c"}
    # time travel pins the old snapshot
    old = {r.entity_id: r.val for r in fmt.read_version(spark, v1).collect()}
    assert old == {1: "a", 2: "b"}


def test_merge_upserts_and_is_idempotent(spark, fmt):
    fmt.write(_df(spark, [(1, "a"), (2, "b")]))
    updates = _df(spark, [(2, "b2"), (4, "d")])
    v_m = fmt.merge(spark, updates, "entity_id")
    merged = {r.entity_id: r.val for r in fmt.read_latest(spark).collect()}
    assert merged == {1: "a", 2: "b2", 4: "d"}
    # T9: re-applying the same updates changes nothing but the version
    v_m2 = fmt.merge(spark, updates, "entity_id")
    assert v_m2 > v_m
    again = {r.entity_id: r.val for r in fmt.read_latest(spark).collect()}
    assert again == merged


def test_vacuum_keeps_current(spark, fmt):
    for i in range(4):
        fmt.write(_df(spark, [(i, f"v{i}")]))
    current = fmt.latest_version()
    fmt.vacuum(keep=2)
    # the pointed-to version always survives retention
    latest = {r.entity_id: r.val for r in fmt.read_latest(spark).collect()}
    assert latest == {3: "v3"}
    assert fmt.latest_version() == current


def test_partitioned_write_prunes(spark, fmt):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(i, i % 4, f"r{i}") for i in range(16)],
        "entity_id long, cell int, val string",
    )
    fmt.write(df, partition_by=["cell"])
    got = fmt.read_latest(spark).filter(F.col("cell") == 2)
    assert sorted(r.entity_id for r in got.collect()) == [2, 6, 10, 14]
    # the filter must reach the scan as a partition filter
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan.split(
        "PartitionFilters:"
    )[1].split("]")[0]


def test_delta_adapter_import_guard():
    """In this sandbox the Delta adapter must fail at CONSTRUCTION with
    an actionable message, never at first verb call."""
    try:
        import delta  # noqa: F401

        pytest.skip("delta present — guard not exercised")
    except ImportError:
        pass
    from caseguarddatapipeline_spark.sources.tableformat import (
        DeltaTableFormat,
    )

    with pytest.raises(ImportError, match="VersionedStoreFormat"):
        DeltaTableFormat("/tmp/nowhere")
