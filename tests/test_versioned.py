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


def test_compact_snapshot_zero_window(spark, tmp_path):
    """Version-pointer compaction: fragmented snapshot collapses into a
    new version with identical rows, the old version stays readable
    (time travel / in-flight readers), an already-compact snapshot is a
    no-op, and vacuum retires the fragmented one afterwards."""
    import os

    from caseguarddatapipeline_spark.sources.versioned import (
        compact_snapshot,
        latest_version,
        read_latest,
        read_version,
        vacuum,
        write_version,
    )

    base = str(tmp_path / "table")
    df = spark.range(10_000).selectExpr("id", "id * 2 AS v")
    v0 = write_version(df.repartition(32), base)  # fragmented: 32 files

    v1 = compact_snapshot(spark, base, target_bytes=64 << 20)
    assert v1 == v0 + 1 and latest_version(base) == v1
    n_files = len(
        [f for f in os.listdir(f"{base}/v={v1}") if f.startswith("part-")]
    )
    assert n_files == 1
    assert sorted(map(tuple, read_latest(spark, base).collect())) == sorted(
        map(tuple, read_version(spark, base, v0).collect())
    )
    # no-op on an already-compact snapshot: same version id back
    assert compact_snapshot(spark, base, target_bytes=64 << 20) == v1
    # retention reclaims the fragmented version
    assert vacuum(base, keep=1) == [v0]
    assert not os.path.isdir(f"{base}/v={v0}")


def test_concurrent_writers_both_land(spark, tmp_path, monkeypatch):
    """Two publishers racing to the same version id: the loser's rename
    onto the claimed v=N must retry under the next free id — both
    snapshots land, distinct ids, pointer valid. The race is simulated
    deterministically by injecting a conflicting v=N directory between
    the loser's version listing and its rename."""
    import os as _os

    from caseguarddatapipeline_spark.sources import versioned as V

    base = str(tmp_path / "store")
    df = spark.range(10).toDF("id")
    v0 = V.write_version(df, base)
    assert v0 == 0

    real_rename = _os.rename
    injected = {"done": False}

    def racing_rename(src, dst):
        # first rename attempt of the next write: conjure the rival
        # writer's v=1 just before the rename lands
        if not injected["done"] and dst.endswith("v=1"):
            injected["done"] = True
            _os.makedirs(dst)
            open(_os.path.join(dst, "part-rival.parquet"), "wb").close()
            open(_os.path.join(dst, "_SUCCESS"), "wb").close()
        return real_rename(src, dst)

    monkeypatch.setattr(V.os, "rename", racing_rename)
    v2 = V.write_version(spark.range(5).toDF("id"), base)
    assert injected["done"]
    assert v2 == 2  # retried past the rival's v=1
    assert V.latest_version(base) == 2
    assert V.read_version(spark, base, 2).count() == 5
    assert sorted(V._versions(base)) == [0, 1, 2]


def test_pointer_is_monotone_against_slow_loser(spark, tmp_path):
    """A slow writer that claimed an OLDER version id cannot regress the
    pointer after a newer version published: _swap_pointer only advances.
    (Before the lock + compare, interleaved pointer writes could end on
    the earlier version, serving a stale snapshot indefinitely.)"""
    from caseguarddatapipeline_spark.sources import versioned as V

    base = str(tmp_path / "store")
    V.write_version(spark.range(3).toDF("id"), base)   # v=0
    V.write_version(spark.range(7).toDF("id"), base)   # v=1, pointer -> 1
    assert V.latest_version(base) == 1
    # the slow loser's pointer write arrives last, carrying its old id
    V._swap_pointer(base, 0)
    assert V.latest_version(base) == 1  # monotone: no regression
    V._swap_pointer(base, 2)  # and a newer id still advances
    assert V.latest_version(base) == 2


def test_pointer_lock_ages_out_after_crashed_holder(tmp_path):
    """A lock file left by a crashed publisher must not wedge the store:
    _swap_pointer ages it out after _LOCK_STALE_SECONDS and proceeds."""
    import os as _os
    import time as _time

    from caseguarddatapipeline_spark.sources import versioned as V

    base = str(tmp_path / "store")
    _os.makedirs(base)
    lock = _os.path.join(base, f"{V._PTR}.lock")
    open(lock, "w").close()
    stale = _time.time() - V._LOCK_STALE_SECONDS - 5
    _os.utime(lock, (stale, stale))
    V._swap_pointer(base, 0)
    assert V.latest_version(base) == 0
    assert not _os.path.exists(lock)


def test_stale_lock_steal_is_exclusive(tmp_path):
    """Stale-lock recovery is rename-steal: N concurrent waiters racing a
    crashed holder's lock all complete, the pointer lands on the max
    version, and no stray lock or steal-residue files remain — the bare
    unlink scheme let two waiters both 'age out' the same lock, the second
    deleting the first's FRESH lock and admitting two writers at once."""
    import os as _os
    import threading
    import time as _time

    from caseguarddatapipeline_spark.sources import versioned as V

    base = str(tmp_path / "store")
    _os.makedirs(base)
    lock = _os.path.join(base, f"{V._PTR}.lock")
    open(lock, "w").close()
    stale = _time.time() - V._LOCK_STALE_SECONDS - 5
    _os.utime(lock, (stale, stale))

    errs = []

    def swap(n):
        try:
            V._swap_pointer(base, n)
        except Exception as e:  # pragma: no cover - the assertion target
            errs.append(e)

    threads = [threading.Thread(target=swap, args=(n,)) for n in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert V.latest_version(base) == 7
    leftovers = [f for f in _os.listdir(base) if f.startswith(V._PTR + ".")]
    assert leftovers == [], leftovers


def test_release_never_unlinks_successor_lock(tmp_path, monkeypatch):
    """Token-checked release: a holder whose lock was stolen mid-swap
    (aged out and re-taken by a waiter) must NOT unlink the successor's
    lock on its way out — the unconditional unlink cascaded steals."""
    import os as _os

    from caseguarddatapipeline_spark.sources import versioned as V

    base = str(tmp_path / "store")
    _os.makedirs(base)
    lock = _os.path.join(base, f"{V._PTR}.lock")
    ptr = _os.path.join(base, V._PTR)
    real_replace = _os.replace

    def steal_during_swap(src, dst):
        real_replace(src, dst)
        if dst == ptr:  # simulate a waiter stealing the lock mid-swap
            with open(lock, "w") as fh:
                fh.write("successor-token")

    monkeypatch.setattr(V.os, "replace", steal_during_swap)
    V._swap_pointer(base, 3)
    monkeypatch.undo()
    assert V.latest_version(base) == 3
    # the stolen holder's release saw a foreign token and RESTORED the
    # successor's lock (atomic rename-claim + link-back, not
    # check-then-unlink), leaving no claim residue behind
    assert _os.path.exists(lock)
    with open(lock) as fh:
        assert fh.read() == "successor-token"
    residue = [
        f
        for f in _os.listdir(base)
        if f.startswith(V._PTR + ".") and f != V._PTR + ".lock"
    ]
    assert residue == [], residue


def test_rel_orphan_aged_out_on_acquire(tmp_path, monkeypatch):
    """Forensic ``.rel-*`` orphans (lock-restore race evidence) must not
    accumulate forever: acquisition sweeps orphans older than 4x the
    stale window, while a FRESH orphan (a successor possibly still in
    its critical section) is preserved."""
    import os as _os
    import time as _time

    from caseguarddatapipeline_spark.sources import versioned as V

    base = str(tmp_path / "store")
    _os.makedirs(base)
    old = _os.path.join(base, f"{V._PTR}.lock.rel-12345-999")
    fresh = _os.path.join(base, f"{V._PTR}.lock.rel-12345-1000")
    for p in (old, fresh):
        with open(p, "w") as fh:
            fh.write("orphan-token")
    stale_age = _time.time() - 5 * V._LOCK_STALE_SECONDS
    _os.utime(old, (stale_age, stale_age))
    V._swap_pointer(base, 1)
    assert not _os.path.exists(old), "aged orphan should be swept"
    assert _os.path.exists(fresh), "fresh orphan must be preserved"
