"""Minimal versioned table store: immutable snapshot directories plus an
atomically-swapped latest pointer — time travel, safe concurrent reads,
and retention, without a table-format dependency.

Layout:  base_dir/v=N/   (immutable parquet snapshot per version)
         base_dir/_LATEST (one-line pointer file, written tmp+rename)

Semantics a lake needs and plain ``mode("overwrite")`` lacks:
- WRITER never mutates data a reader might hold open: each write is a
  NEW directory; the pointer swap is a single rename (atomic on POSIX
  and object-store-manifest equivalents), so a concurrent
  ``read_latest`` sees wholly old or wholly new — never a mix.
- TIME TRAVEL: ``read_version`` pins any retained snapshot (the input
  a reproducible training run records is a (base_dir, version) pair).
- RETENTION: ``vacuum`` deletes all but the newest K snapshots, never
  the pointed-to one.

This is deliberately the 20-line core of what Delta/Iceberg provide —
where those are available, swap them in; the call sites keep the same
shape (write → version id, read by version). Diffing two versions is
``operators.contracts.snapshot_diff(read_version(a), read_version(b))``.

The exit ramp is ``sources/tableformat.py`` (round 9): a ``TableFormat``
interface with this store as the sandbox-default implementation and a
Delta adapter mapping every verb (write/read_version/merge/vacuum) onto
the open format — the contract suite in tests/test_tableformat.py runs
any registered adapter through identical assertions.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

_PTR = "_LATEST"


def _versions(base_dir: str) -> list[int]:
    if not os.path.isdir(base_dir):
        return []
    return sorted(
        int(m.group(1))
        for d in os.listdir(base_dir)
        if (m := re.fullmatch(r"v=(\d+)", d))
    )


def write_version(
    df: DataFrame, base_dir: str, partition_by: list[str] | None = None
) -> int:
    """Write ``df`` as the next immutable snapshot and swap the pointer.
    Returns the new version id.

    ``partition_by`` lays the snapshot out as hive-style partition
    directories (e.g. ``v=N/cell=3/``) so readers that filter on the
    partition column get static partition PRUNING at the scan — the
    versioned-store face of "the probe join becomes partition pruning".
    Note ``compact_snapshot`` only bin-packs flat snapshots (it lists
    top-level files) and is a safe no-op on partitioned ones.

    The snapshot is staged in a dot-prefixed temp directory (named by
    pid+monotonic time, so concurrent writers never share staging) and
    renamed into place only after the write committed (_SUCCESS marker
    present), so a crash mid-write leaves an invisible ``.staging-*``
    dir — never a half-populated ``v=N`` that readers or ``vacuum``
    would mistake for a real version.

    Concurrent publishers are SAFE, not just crash-safe: two writers can
    race to the same next version id, and directory rename onto an
    existing non-empty ``v=N`` fails — the loser re-lists versions and
    retries the rename under the next free id instead of erroring, so
    both snapshots land. The pointer swap is MONOTONE (``_swap_pointer``):
    racing publishers serialize on a tiny lock file, each writes its own
    uniquely-named temp, and a slow loser can never regress the pointer
    below a later-published version — it ends on the newest id."""
    import time

    os.makedirs(base_dir, exist_ok=True)
    staging = os.path.join(
        base_dir, f".staging-{os.getpid()}-{time.monotonic_ns()}"
    )
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)
    if not os.path.exists(os.path.join(staging, "_SUCCESS")):
        raise IOError(f"snapshot write did not commit: {staging}")
    for _ in range(64):  # bound: pathological publisher storms error out
        vs = _versions(base_dir)
        n = (vs[-1] + 1) if vs else 0
        target = os.path.join(base_dir, f"v={n}")
        try:
            os.rename(staging, target)
            break
        except OSError:
            if not os.path.exists(target):  # a real failure, not the race
                raise
            continue  # another writer claimed v=N: retry under the next id
    else:
        raise IOError(f"could not claim a version slot in {base_dir}")
    _swap_pointer(base_dir, n)
    return n


_LOCK_STALE_SECONDS = 30.0


def _swap_pointer(base_dir: str, n: int) -> None:
    """Advance ``_LATEST`` to ``n`` iff ``n`` is newer than what it holds.

    Readers stay lock-free (they see the pointer only through the atomic
    ``os.replace``); WRITERS serialize on an ``O_CREAT|O_EXCL`` lock file
    so the read-compare-swap is not interleaved. Two guarantees plain
    tmp+rename lacked: (1) each writer's temp file is uniquely named, so
    racing publishers never clobber or unlink each other's in-flight temp;
    (2) the pointer is MONOTONE — a slow writer that claimed an older
    version id cannot overwrite the pointer of a later-published one.

    Stale-lock recovery is RENAME-STEAL, not unlink: a crashed holder's
    lock (older than ``_LOCK_STALE_SECONDS``) is renamed aside before
    deletion, and rename is atomic, so exactly ONE of N waiters reclaims
    it — a bare unlink lets two waiters pass the staleness check, each
    delete a lock (the second deleting the first's FRESH lock), and both
    enter the critical section, which can regress the pointer. Release is
    the SAME atomic-claim trick: each holder writes a unique token into
    its lock, renames the lock path to a holder-unique name (atomic — it
    either claims its own lock or a successor's, never a torn state), and
    unlinks the claim only if the token inside is its own; a foreign token
    is restored via link(2), which cannot clobber a newer lock. A plain
    read-token-then-unlink release left a window where a stale-stolen
    holder deleted its successor's fresh lock."""
    import time

    ptr = os.path.join(base_dir, _PTR)
    lock = ptr + ".lock"
    token = f"{os.getpid()}-{time.monotonic_ns()}"
    deadline = time.monotonic() + 2 * _LOCK_STALE_SECONDS
    # Age out forensic ``.rel-*`` orphans left by the lock-restore race
    # below: each pathological double-overstay leaves one behind, and
    # nothing else ever deletes them. An orphan older than 4x the stale
    # window is guaranteed dead — the successor whose claimed lock it
    # preserves can hold the section at most 1x the window before being
    # stale-stolen itself, so after 4x no live holder references it.
    try:
        prefix = os.path.basename(lock) + ".rel-"
        for name in os.listdir(base_dir):
            if not name.startswith(prefix):
                continue
            orphan = os.path.join(base_dir, name)
            try:
                if time.time() - os.path.getmtime(orphan) > 4 * _LOCK_STALE_SECONDS:
                    os.unlink(orphan)
            except OSError:
                pass  # another waiter swept it, or it vanished: fine
    except OSError:
        pass  # listing failed (base_dir racing a teardown): skip the sweep
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, token.encode())
            os.close(fd)
            break
        except FileExistsError:
            try:  # holder crashed mid-swap: age the lock out
                if time.time() - os.path.getmtime(lock) > _LOCK_STALE_SECONDS:
                    # atomic steal: only ONE waiter's rename succeeds
                    stolen = f"{lock}.stale-{os.getpid()}-{time.monotonic_ns()}"
                    try:
                        os.rename(lock, stolen)
                        os.unlink(stolen)
                    except OSError:
                        pass  # another waiter stole it first: retry create
                    continue
            except FileNotFoundError:
                continue  # holder released between the two calls: retry now
            if time.monotonic() > deadline:
                raise IOError(f"pointer lock wedged in {base_dir}: {lock}")
            time.sleep(0.01)
    try:
        cur = -1
        try:
            with open(ptr) as fh:
                cur = int(fh.read().strip())
        except (FileNotFoundError, ValueError):
            pass
        if n > cur:
            tmp = f"{ptr}.tmp-{os.getpid()}-{time.monotonic_ns()}"
            with open(tmp, "w") as fh:
                fh.write(str(n))
            os.replace(tmp, ptr)  # atomic for readers; lock orders writers
    finally:
        # Release by ATOMIC claim, not check-then-unlink: rename the lock
        # path to a holder-unique name first (only one process can win the
        # rename), THEN inspect the claimed file's token. The old scheme
        # read the token in place and unlinked the lock path afterwards —
        # a holder stalled past the stale window could pass the check,
        # lose the lock to a steal, and unlink the successor's FRESH lock
        # created in the microseconds between its check and its unlink.
        rel = f"{lock}.rel-{token}"
        try:
            os.rename(lock, rel)
        except OSError:
            rel = None  # lock already aged out and stolen: nothing to do
        if rel is not None:
            try:
                with open(rel) as fh:
                    mine = fh.read() == token
            except OSError:
                mine = False
            if mine:
                os.unlink(rel)
            else:
                # We claimed a SUCCESSOR's live lock (ours was stale-stolen
                # while we were in the critical section). Put it back with
                # link(2), which is atomic and fails EEXIST rather than
                # clobbering a third waiter's lock created in the window.
                # RESIDUAL WINDOW (unfixable with rename+link alone):
                # between our rename-claim and this restore, the lock path
                # is briefly absent, so a third waiter's O_CREAT|O_EXCL
                # acquire can succeed — then the link fails EEXIST while
                # the successor still believes it holds the section. Only
                # reachable after a holder overstays the 30s stale window
                # TWICE over (ours stale-stolen AND the claim/restore gap
                # hit); pointer monotonicity plus the n > cur guard bound
                # the damage to "no regression, possible duplicate
                # publish attempt of the same version". We make the
                # anomaly OBSERVABLE instead of silent: the successor's
                # claimed file stays in place under its .rel- name (its
                # own release will rename-miss and no-op; the orphan is
                # forensic evidence) and a warning fires.
                try:
                    os.link(rel, lock)
                except OSError:
                    import warnings

                    warnings.warn(
                        f"versioned-store lock restore raced at {lock}: a "
                        f"third waiter acquired during release; successor's "
                        f"claimed lock preserved at {rel} for inspection",
                        RuntimeWarning,
                        stacklevel=2,
                    )
                else:
                    try:
                        os.unlink(rel)
                    except OSError:
                        pass


def latest_version(base_dir: str) -> int:
    with open(os.path.join(base_dir, _PTR)) as fh:
        return int(fh.read().strip())


def read_version(spark: SparkSession, base_dir: str, version: int) -> DataFrame:
    path = os.path.join(base_dir, f"v={version}")
    if not os.path.isdir(path):
        raise FileNotFoundError(f"version {version} not retained in {base_dir}")
    return spark.read.parquet(path)


def read_latest(spark: SparkSession, base_dir: str) -> DataFrame:
    return read_version(spark, base_dir, latest_version(base_dir))


def compact_snapshot(
    spark: SparkSession, base_dir: str, target_bytes: int = 128 << 20
) -> int:
    """Small-file compaction through the version pointer — the
    ZERO-ABSENCE-WINDOW path the directory-swap compaction
    (operators/layout.compact_partitions) documents as the table-format
    upgrade: the latest snapshot is rewritten into ~``target_bytes``
    files as a NEW version, and the atomic pointer swap publishes it —
    readers hold wholly-old or wholly-new, no partition is ever briefly
    missing, a crash leaves only an invisible staging dir, and the old
    files live until ``vacuum`` retires them (which is also what makes
    this costlier: 2× storage until retention, where the directory swap
    reclaims space immediately). Returns the new version id; no-op
    (returns the current id) when the snapshot is already a single
    target-sized file set."""
    import math

    v = latest_version(base_dir)
    vdir = os.path.join(base_dir, f"v={v}")
    files = [
        os.path.join(vdir, f)
        for f in os.listdir(vdir)
        if f.endswith(".parquet") or f.startswith("part-")
    ]
    total = sum(os.path.getsize(f) for f in files if os.path.isfile(f))
    n_target = max(1, math.ceil(total / target_bytes))
    if len(files) <= n_target:
        return v
    return write_version(read_version(spark, base_dir, v).repartition(n_target), base_dir)


def vacuum(base_dir: str, keep: int = 2) -> list[int]:
    """Drop all but the newest ``keep`` snapshots (the pointed-to version
    is always retained). Returns the removed version ids.

    Retention contract (same as Delta VACUUM): the pointer swap protects
    concurrent ``read_latest`` RESOLUTION, but a lazily-built DataFrame
    pinned to an old version keeps referencing its files — run vacuum
    with a ``keep`` horizon longer than any job still reading an old
    snapshot, exactly as you would choose a VACUUM retention period."""
    import shutil

    keep = max(1, keep)
    vs = _versions(base_dir)
    current = latest_version(base_dir)
    removable = [v for v in vs[:-keep] if v != current] if len(vs) > keep else []
    for v in removable:
        shutil.rmtree(os.path.join(base_dir, f"v={v}"))
    return removable
