#!/usr/bin/env python
"""Round-12 optimization profiler: run named queries (or the whole
headline suite) with the noop sink, print per-run timings, and
optionally dump `.explain("formatted")` to plans/r13/<query>_<tag>.txt.

Usage:
    python scripts/profile_r13.py q1_pricing_summary doc_pagerank --n 3
    python scripts/profile_r13.py --headline --n 1
    python scripts/profile_r13.py doc_pagerank --explain before

Timing methodology is identical to bench.py (same session factory, same
noop sink, same warmup queries) so numbers here are comparable to
BENCH_rNN rows.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clx_etl_spark.queries import load_all
from clx_etl_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--n", type=int, default=1, help="repetitions per query")
    ap.add_argument("--headline", action="store_true")
    ap.add_argument("--explain", default=None, metavar="TAG",
                    help="dump explain('formatted') to plans/r13/<q>_<TAG>.txt")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("clx-spark-profile-r13")
    registry = load_all()

    names = list(args.names)
    if args.headline:
        import bench
        names = [n for n in bench.HEADLINE if n not in names] + names

    if not args.no_warmup:
        spark.sparkContext.setJobDescription("warmup")
        registry["q6_revenue_delta"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        registry["mm_media_metadata"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    out: dict[str, list[float]] = {}
    for name in names:
        q = registry[name]
        if args.explain:
            df = q.fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            os.makedirs(os.path.join("plans", "r13"), exist_ok=True)
            path = os.path.join("plans", "r13", f"{name}_{args.explain}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {path}", file=sys.stderr)
        runs = []
        for i in range(args.n):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = runs
        print(f"{name}: {runs}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
