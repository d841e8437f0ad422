"""bench.py contract: the driver invokes it blind, so a renamed catalog
entry or a typo in the DOP map must fail HERE, not in the recorded
artifact."""

from __future__ import annotations

import bench
from caseguarddatapipeline_spark.catalog import build_catalog


def test_bench_queries_resolve_and_have_oracles():
    queries, oracles = build_catalog()
    missing = [n for n in bench.BENCH_QUERIES if n not in queries]
    assert not missing, f"bench names not in catalog: {missing}"
    # every headliner is value-checked against DuckDB (baseline_duck.py
    # times the same SQL — a bench query without an oracle would
    # silently drop out of the baseline and skew the comparison)
    no_oracle = [n for n in bench.BENCH_QUERIES if n not in oracles]
    assert not no_oracle, f"bench names without oracles: {no_oracle}"


def test_dop_map_keys_are_bench_queries():
    unknown = [n for n in bench._DOP if n not in bench.BENCH_QUERIES]
    assert not unknown, f"_DOP keys not in BENCH_QUERIES: {unknown}"
    assert all(v >= 1 for v in bench._DOP.values())
