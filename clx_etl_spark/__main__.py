"""CLI entry point: run a registered query (or list them) from the shell.

    python -m clx_etl_spark list
    python -m clx_etl_spark run q1_pricing_summary --sf /root/testdata/sf0.01
    python -m clx_etl_spark run w1_gap_detect --explain
    python -m clx_etl_spark run dedup_exact --json --limit 5

The operational surface the reference exposes through Prefect deployments
(reference: src/deploy.py) — here, every registered query is directly
invokable with the same (spark, sf_dir) contract the driver harness uses.
"""

from __future__ import annotations

import argparse
import json
import sys

from .catalog import DEFAULT_SF_DIR
from .queries import load_all
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="clx_etl_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered queries")
    runp = sub.add_parser("run", help="run a registered query")
    runp.add_argument("name")
    runp.add_argument("--sf", default=DEFAULT_SF_DIR, help="testdata dir")
    runp.add_argument("--limit", type=int, default=20)
    runp.add_argument("--json", action="store_true", help="JSON lines output")
    runp.add_argument("--explain", action="store_true",
                      help="print the formatted physical plan instead")
    args = p.parse_args(argv)

    reg = load_all()
    if args.cmd == "list":
        for name, q in reg.items():
            kind = "hash" if q.oracle else "rows-only"
            print(f"{name}\t{kind}")
        return 0

    if args.name not in reg:
        print(f"unknown query {args.name!r}; `list` shows all", file=sys.stderr)
        return 2
    spark = get_spark("clx-cli")
    df = reg[args.name].fn(spark, args.sf)
    if args.explain:
        df.explain("formatted")
        return 0
    rows = df.limit(args.limit).collect()
    if args.json:
        for r in rows:
            print(json.dumps(r.asDict(), default=str))
    else:
        df.limit(args.limit).show(args.limit, truncate=40)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
