"""Trusted store-root hardening (sources/stores.py): per-user 0700 root,
env override, ownership verification — a world-writable tempdir home with
predictable names let another user pre-create and poison a store dir."""

from __future__ import annotations

import os
import stat

import pytest

from caseguarddatapipeline_spark.sources import stores


def test_store_root_defaults_to_per_uid_private_dir(monkeypatch, tmp_path):
    monkeypatch.delenv("CASEGUARD_STORE_ROOT", raising=False)
    monkeypatch.setattr(stores.tempfile, "gettempdir", lambda: str(tmp_path))
    root = stores.store_root()
    uid = os.getuid()
    assert root == str(tmp_path / f"caseguard-stores-{uid}")
    mode = stat.S_IMODE(os.stat(root).st_mode)
    assert mode & (stat.S_IWGRP | stat.S_IWOTH) == 0


def test_store_root_honors_env_override(monkeypatch, tmp_path):
    override = str(tmp_path / "lake-stores")
    monkeypatch.setenv("CASEGUARD_STORE_ROOT", override)
    assert stores.store_root() == override
    assert os.path.isdir(override)


def test_store_root_strips_group_other_write(monkeypatch, tmp_path):
    override = tmp_path / "loose"
    override.mkdir()
    os.chmod(override, 0o777)
    monkeypatch.setenv("CASEGUARD_STORE_ROOT", str(override))
    root = stores.store_root()
    mode = stat.S_IMODE(os.stat(root).st_mode)
    assert mode & (stat.S_IWGRP | stat.S_IWOTH) == 0


def test_store_root_rejects_foreign_owner(monkeypatch, tmp_path):
    """A pre-created root owned by another uid must raise, not serve."""
    override = tmp_path / "planted"
    override.mkdir()
    monkeypatch.setenv("CASEGUARD_STORE_ROOT", str(override))
    real_uid = os.getuid()
    monkeypatch.setattr(stores.os, "getuid", lambda: real_uid + 1)
    with pytest.raises(PermissionError, match="owned by uid"):
        stores.store_root()


def test_fingerprint_store_dir_lives_under_trusted_root(monkeypatch, tmp_path):
    override = str(tmp_path / "root")
    monkeypatch.setenv("CASEGUARD_STORE_ROOT", override)
    d = stores.fingerprint_store_dir(str(tmp_path), "nope.parquet", "annidx", 3)
    assert d.startswith(override + os.sep + "annidx" + os.sep)
    # same inputs -> same tag; bumped layout version -> different tag
    assert d == stores.fingerprint_store_dir(
        str(tmp_path), "nope.parquet", "annidx", 3
    )
    assert d != stores.fingerprint_store_dir(
        str(tmp_path), "nope.parquet", "annidx", 4
    )


def test_store_root_rejects_symlinked_default(monkeypatch, tmp_path):
    """Round-8 advice fix: an attacker pre-creating the PREDICTABLE
    default root as a symlink to a victim-owned directory must be
    rejected — os.stat follows symlinks and would have passed the
    ownership check against the TARGET, redirecting store writes (and
    the chmod) to an attacker-chosen path."""
    victim = tmp_path / "victim"
    victim.mkdir()
    fake_tmp = tmp_path / "tmp"
    fake_tmp.mkdir()
    uid = os.getuid()
    (fake_tmp / f"caseguard-stores-{uid}").symlink_to(victim)
    monkeypatch.delenv("CASEGUARD_STORE_ROOT", raising=False)
    monkeypatch.setattr(stores.tempfile, "gettempdir", lambda: str(fake_tmp))
    with pytest.raises(PermissionError, match="symlink"):
        stores.store_root()


def test_store_root_override_may_be_symlink(monkeypatch, tmp_path):
    """The explicit CASEGUARD_STORE_ROOT is operator-chosen and may
    legitimately be a symlink (e.g. /data -> a mount) — only the DEFAULT
    root's symlink check applies."""
    target = tmp_path / "mount"
    target.mkdir()
    link = tmp_path / "data"
    link.symlink_to(target)
    monkeypatch.setenv("CASEGUARD_STORE_ROOT", str(link))
    assert stores.store_root() == str(link)
