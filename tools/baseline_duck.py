"""Time the DuckDB oracles for the bench headline queries — the
calibration baseline BASELINE.md defines (the reference publishes no
sec/query numbers, so the effective target is DuckDB running the same
SQL on the same parquet at the same scale factor).

Usage: python tools/baseline_duck.py [sf_dir]   (default /root/testdata/sf0.1)
Prints one JSON line mirroring bench.py's shape for side-by-side reads.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
from caseguarddatapipeline_spark.catalog import build_catalog  # noqa: E402
from caseguarddatapipeline_spark.sources.tables import TABLES  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)
    _, oracles = build_catalog()
    con = duckdb.connect()
    con.sql("SET threads=32")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    # Two passes of (2 untimed + min-of-5 timed) per query, min across
    # passes — the identical schedule bench.py runs, so both engines are
    # measured at equal steady-state depth.
    timings: dict[str, float] = {n: float("inf") for n in bench.BENCH_QUERIES}
    for _ in range(2):
        for name in bench.BENCH_QUERIES:
            sql = oracles.get(name)
            if sql is None:
                timings.pop(name, None)
                continue
            for _ in range(2):
                con.sql(sql).fetchall()
            best = timings[name]
            for _ in range(5):
                t0 = time.perf_counter()
                con.sql(sql).fetchall()
                best = min(best, time.perf_counter() - t0)
            timings[name] = best
    timings = {n: round(v, 3) for n, v in timings.items()}
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_suite_runtime",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
