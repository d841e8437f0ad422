"""TableFormat contract suite (round-9 verdict item 4): every registered
implementation must pass the same write/read/time-travel/merge/vacuum
assertions — the proof that call sites programmed against the interface
survive an adapter swap. The sandbox registers the bespoke versioned
store; a Delta/Iceberg adapter added later is proven by adding one
fixture param."""

from __future__ import annotations

import pytest


@pytest.fixture(params=["versioned", "manifest"])
def fmt(request, tmp_path):
    if request.param == "versioned":
        from caseguarddatapipeline_spark.sources.tableformat import (
            VersionedStoreFormat,
        )

        return VersionedStoreFormat(str(tmp_path / "tbl"))
    if request.param == "manifest":
        from caseguarddatapipeline_spark.sources.tableformat import (
            ManifestTableFormat,
        )

        return ManifestTableFormat(str(tmp_path / "tbl"))
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


def test_manifest_reader_ignores_uncommitted_data(spark, tmp_path):
    """A data dir without a manifest (crashed write) must be invisible to
    readers; vacuum sweeps it only once COLD (age threshold) — a fresh
    unmanifested dir is indistinguishable from an in-flight writer whose
    version sorts below the survivors, so version order alone never
    justifies deletion (round-11 advice fix)."""
    import os

    from caseguarddatapipeline_spark.sources.tableformat import (
        ManifestTableFormat,
    )

    fmt = ManifestTableFormat(str(tmp_path / "tbl"))
    v0 = fmt.write(_df(spark, [(1, "a")]))
    # simulate a crash: data for v1 lands, manifest never commits
    _df(spark, [(9, "ghost")]).write.parquet(
        os.path.join(fmt._data_dir, "v1")
    )
    assert fmt.latest_version() == v0
    assert {r.entity_id for r in fmt.read_latest(spark).collect()} == {1}
    v2 = fmt.write(_df(spark, [(2, "b")]))  # next commit skips past v1
    assert v2 == 2
    # default vacuum: the orphan is FRESH -> presumed in-flight, kept
    fmt.vacuum(keep=1)
    assert os.path.isdir(os.path.join(fmt._data_dir, "v1"))
    # once cold (age threshold elapsed) the crash debris is swept
    fmt.vacuum(keep=1, orphan_age_s=0.0)
    assert not os.path.isdir(os.path.join(fmt._data_dir, "v1"))
    assert {r.entity_id for r in fmt.read_latest(spark).collect()} == {2}


def test_manifest_vacuum_never_sweeps_inflight_writer(spark, tmp_path):
    """The round-11 advice race: writer A allocates version 1 and is
    still writing while writers commit v2, v3; vacuum(keep=2) must NOT
    delete A's in-flight dir even though 1 < min(survivors)={2}. And if
    a pathological vacuum DID sweep it, A's manifest commit must fail
    loudly instead of committing a version that references deleted
    files."""
    import os

    from caseguarddatapipeline_spark.sources.tableformat import (
        ManifestTableFormat,
    )

    fmt = ManifestTableFormat(str(tmp_path / "tbl"))
    fmt.write(_df(spark, [(0, "v0")]))  # v0
    # writer A: version 1 pre-allocated, data written, manifest NOT yet
    # committed (exactly the state between write()'s parquet write and
    # its _commit_manifest call)
    a_dir = os.path.join(fmt._data_dir, "v1")
    _df(spark, [(1, "inflight")]).write.parquet(a_dir)
    a_files = sorted(
        os.path.relpath(os.path.join(root, f), fmt._data_dir)
        for root, _, fs in os.walk(a_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    # faster writers commit v2 and v3; retention runs with defaults
    assert fmt.write(_df(spark, [(2, "v2")])) == 2
    assert fmt.write(_df(spark, [(3, "v3")])) == 3
    dropped = fmt.vacuum(keep=2)
    assert dropped == [0]
    assert os.path.isdir(a_dir), "in-flight writer's dir was swept"
    # A's commit now succeeds and the version reads back intact
    fmt._commit_manifest({"version": 1, "partition_by": [], "files": a_files})
    assert {r.val for r in fmt.read_version(spark, 1).collect()} == {"inflight"}
    # corruption backstop: a commit whose files vanished must raise and
    # leave no manifest behind
    import shutil

    b_dir = os.path.join(fmt._data_dir, "v9")
    _df(spark, [(9, "doomed")]).write.parquet(b_dir)
    b_files = sorted(
        os.path.relpath(os.path.join(root, f), fmt._data_dir)
        for root, _, fs in os.walk(b_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    shutil.rmtree(b_dir)
    with pytest.raises(RuntimeError, match="vanished before commit"):
        fmt._commit_manifest({"version": 9, "partition_by": [], "files": b_files})
    assert 9 not in fmt._manifests()


@pytest.mark.parametrize("which", ["versioned", "manifest"])
def test_vecindex_flow_over_tableformat(spark, tmp_path, which):
    """The vecindex maintenance verbs (build partitioned postings →
    idempotent upsert-merge → TTL prune → probe with partition pruning),
    driven purely through the TableFormat interface, produce identical
    results under BOTH runnable implementations — the coded form of the
    'swapping the store is constructing a different adapter' claim."""
    import pyspark.sql.functions as F

    from caseguarddatapipeline_spark.sources.tableformat import (
        ManifestTableFormat,
        VersionedStoreFormat,
    )

    cls = VersionedStoreFormat if which == "versioned" else ManifestTableFormat
    fmt = cls(str(tmp_path / f"idx-{which}"))
    posts = spark.createDataFrame(
        [(i, i % 4, i * 10) for i in range(32)],
        "vec_id long, cell int, payload long",
    )
    fmt.write(posts, partition_by=["cell"])
    # upsert a batch (same key overwrites, new key inserts) — T9 verb
    updates = spark.createDataFrame(
        [(3, 3 % 4, 999), (100, 0, 1000)],
        "vec_id long, cell int, payload long",
    )
    fmt.merge(spark, updates, "vec_id")
    fmt.merge(spark, updates, "vec_id")  # idempotent re-apply
    # TTL prune: drop the high ids, publish as a new version
    kept = fmt.read_latest(spark).filter(F.col("vec_id") < 50)
    fmt.write(kept, partition_by=["cell"])
    probe = fmt.read_latest(spark).filter(F.col("cell") == 3)
    got = {(r.vec_id, r.payload) for r in probe.collect()}
    assert got == {(i, i * 10) for i in range(32) if i % 4 == 3 and i != 3} | {
        (3, 999)
    }
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan.split(
        "PartitionFilters:"
    )[1].split("]")[0]
