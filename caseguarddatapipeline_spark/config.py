"""Tenant configuration source (S11) + env-template resolution (F19).

Mirrors core/tenant_manager.py:64-132 (JSON load, required-field
validation, TTL cache) and :428-456 (${VAR} credential substitution).
Config is driver-side state: KB-sized, read once per TTL, then carried to
executors as a broadcast variable — every operator that is "parameterized
by tenant config" reads the broadcast, never a file, so 1000 executors
cost one send."""

from __future__ import annotations

import copy
import json
import os
import re
import time
from typing import Any

from pyspark.sql import SparkSession

REQUIRED_KEYS = ("tenant_id", "crm_type")

_ENV_PATTERN = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")


def resolve_env_templates(obj: Any) -> Any:
    """F19: recursively substitute ``${VAR}`` from the environment in all
    string values (tenant_manager.py:428-456). Unset vars raise — a
    missing credential must fail loudly at load, not at first use."""
    if isinstance(obj, str):

        def sub(m: re.Match) -> str:
            var = m.group(1)
            val = os.environ.get(var)
            if val is None:
                raise KeyError(f"config references unset env var ${{{var}}}")
            return val

        return _ENV_PATTERN.sub(sub, obj)
    if isinstance(obj, dict):
        return {k: resolve_env_templates(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [resolve_env_templates(v) for v in obj]
    return obj


def load_tenant_config(path: str) -> dict:
    """S11: load + validate a tenant JSON config (driver-side)."""
    with open(path) as fh:
        cfg = json.load(fh)
    missing = [k for k in REQUIRED_KEYS if k not in cfg]
    if missing:
        raise ValueError(f"tenant config {path} missing keys: {missing}")
    return resolve_env_templates(cfg)


class ConfigCache:
    """TTL cache for tenant configs (tenant_manager.py:59-97: 300s TTL).
    ``clock`` is injectable for deterministic tests."""

    def __init__(self, ttl_seconds: float = 300.0, clock=time.monotonic):
        self._ttl = ttl_seconds
        self._clock = clock
        self._entries: dict[str, tuple[float, dict]] = {}

    def get(self, path: str) -> dict:
        now = self._clock()
        hit = self._entries.get(path)
        if hit is not None and now - hit[0] < self._ttl:
            # deep copy: the cache hands the SAME dict to every caller
            # within the TTL, so one handler mutating its config (key
            # rotation, field pop) must not corrupt other tenants' view
            return copy.deepcopy(hit[1])
        cfg = load_tenant_config(path)
        self._entries[path] = (now, cfg)
        return copy.deepcopy(cfg)

    def invalidate(self, path: str | None = None) -> None:
        if path is None:
            self._entries.clear()
        else:
            self._entries.pop(path, None)


def broadcast_config(spark: SparkSession, cfg: dict):
    """Ship the config to executors once; UDFs read ``bc.value``."""
    return spark.sparkContext.broadcast(cfg)
