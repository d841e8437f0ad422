"""Tenant config source (S11): validation, ${VAR} resolution (F19), TTL
cache behavior, broadcast round-trip."""

from __future__ import annotations

import json

import pytest

from caseguarddatapipeline_spark.config import (
    ConfigCache,
    broadcast_config,
    load_tenant_config,
    resolve_env_templates,
)

GOOD = {"tenant_id": "fdm", "crm_type": "proclaim", "api_key": "${FAKE_API_KEY}"}


def _write(tmp_path, cfg, name="t.json"):
    p = tmp_path / name
    p.write_text(json.dumps(cfg))
    return str(p)


def test_load_and_resolve(tmp_path, monkeypatch):
    monkeypatch.setenv("FAKE_API_KEY", "sekret")
    cfg = load_tenant_config(_write(tmp_path, GOOD))
    assert cfg["api_key"] == "sekret"
    assert cfg["tenant_id"] == "fdm"


def test_missing_required_key(tmp_path):
    with pytest.raises(ValueError, match="crm_type"):
        load_tenant_config(_write(tmp_path, {"tenant_id": "x"}))


def test_unset_env_var_fails_loudly(tmp_path, monkeypatch):
    monkeypatch.delenv("FAKE_API_KEY", raising=False)
    with pytest.raises(KeyError, match="FAKE_API_KEY"):
        load_tenant_config(_write(tmp_path, GOOD))


def test_nested_resolution(monkeypatch):
    monkeypatch.setenv("HOSTVAR", "db.internal")
    out = resolve_env_templates(
        {"db": {"url": "postgres://${HOSTVAR}:5432"}, "list": ["${HOSTVAR}", 7]}
    )
    assert out["db"]["url"] == "postgres://db.internal:5432"
    assert out["list"] == ["db.internal", 7]


def test_ttl_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("FAKE_API_KEY", "v1")
    path = _write(tmp_path, GOOD)
    now = [0.0]
    cache = ConfigCache(ttl_seconds=300, clock=lambda: now[0])
    assert cache.get(path)["api_key"] == "v1"
    # within TTL: cached value survives an env change
    monkeypatch.setenv("FAKE_API_KEY", "v2")
    now[0] = 299.0
    assert cache.get(path)["api_key"] == "v1"
    # past TTL: reloaded
    now[0] = 301.0
    assert cache.get(path)["api_key"] == "v2"


def test_broadcast_roundtrip(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("FAKE_API_KEY", "k")
    cfg = load_tenant_config(_write(tmp_path, GOOD))
    bc = broadcast_config(spark, cfg)
    got = (
        spark.sparkContext.parallelize([1, 2], 2)
        .map(lambda _: bc.value["tenant_id"])
        .collect()
    )
    assert got == ["fdm", "fdm"]


def test_scheduler_pool_thread_isolation(spark):
    """Pool assignment is thread-local: two concurrent 'tenants' run in
    their own FAIR pools and both complete with correct results."""
    import threading

    import pyspark.sql.functions as F

    from caseguarddatapipeline_spark.session import scheduler_pool

    results = {}

    def tenant(name: str, n: int):
        with scheduler_pool(spark, name):
            assert (
                spark.sparkContext.getLocalProperty("spark.scheduler.pool")
                == name
            )
            results[name] = (
                spark.range(n).agg(F.sum("id").alias("s")).collect()[0].s
            )

    threads = [
        threading.Thread(target=tenant, args=(f"tenant_{i}", 10_000 * (i + 1)))
        for i in range(3)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == {
        f"tenant_{i}": (10_000 * (i + 1) - 1) * (10_000 * (i + 1)) // 2
        for i in range(3)
    }
    # property restored after the context exits
    assert spark.sparkContext.getLocalProperty("spark.scheduler.pool") is None
