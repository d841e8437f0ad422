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
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
from caseguarddatapipeline_spark.catalog import build_catalog  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)
    _, oracles = build_catalog()
    # Identical schedule to bench.py's Spark suite (shared helper), so
    # both engines are measured at equal steady-state depth.
    timings = bench.duck_suite(sf_dir, oracles)
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
