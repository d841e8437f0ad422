"""CLI front door: run any catalog query from the shell.

    python -m caseguarddatapipeline_spark list [prefix]
    python -m caseguarddatapipeline_spark run <query> [--sf-dir DIR] [--limit N]
    python -m caseguarddatapipeline_spark explain <query> [--sf-dir DIR]
    python -m caseguarddatapipeline_spark oracle <query>

`list` needs no Spark session (registry only); `run` prints the result as
JSON lines (the scriptable form — pipe to jq), `explain` prints the
formatted physical plan, `oracle` prints the query's DuckDB oracle SQL.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="caseguarddatapipeline_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_list = sub.add_parser("list", help="list catalog queries")
    p_list.add_argument("prefix", nargs="?", default="")
    for name in ("run", "explain"):
        p = sub.add_parser(name)
        p.add_argument("query")
        p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
        if name == "run":
            p.add_argument("--limit", type=int, default=20)
    p_or = sub.add_parser("oracle", help="print the DuckDB oracle SQL")
    p_or.add_argument("query")
    args = ap.parse_args(argv)

    from .catalog import build_catalog

    queries, oracles = build_catalog()

    if args.cmd == "list":
        for name in queries:
            if name.startswith(args.prefix):
                tag = "sql" if name in oracles else "rows-only"
                print(f"{name}\t{tag}")
        return 0

    if args.query not in queries:
        print(f"unknown query: {args.query} (try `list`)", file=sys.stderr)
        return 2

    if args.cmd == "oracle":
        if args.query not in oracles:
            print(f"{args.query} is rows-only (no oracle)", file=sys.stderr)
            return 1
        print(oracles[args.query].strip())
        return 0

    from .session import get_spark

    spark = get_spark("cli")
    try:
        df = queries[args.query](spark, args.sf_dir)
        if args.cmd == "explain":
            df.explain("formatted")
        else:
            for row in df.limit(args.limit).collect():
                print(json.dumps(row.asDict(), default=str))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
