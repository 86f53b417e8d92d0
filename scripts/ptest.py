#!/usr/bin/env python
"""Sharded test runner (VERDICT r10 item 5): the full suite in N
concurrent pytest processes, identical coverage, < 30 min wall-clock
instead of ~95.

No pytest-xdist in this environment, so this is the same idea by hand:

  1. collect every test node id once (`pytest --collect-only -q`);
  2. deal nodes round-robin into N shards — node-level dealing (not
     file-level) because two files (the 217-query oracle sweep and the
     versioned-sink suite) dominate the wall-clock and must spread;
  3. run one pytest subprocess per shard, each with its OWN Spark
     session (CLX_TEST_MASTER sizes the thread pool so N shards fit
     the box), warehouse dir, Derby home, and pytest basetemp — the
     contention surfaces a shared cwd would create;
  4. aggregate: print each shard's tail, exit nonzero if any failed.

Usage:  python scripts/ptest.py [N] [extra pytest args...]
        N defaults to 8 (8 shards x local[6] on the 32-cpu box).

The single-process protocol (`python -m pytest tests/ -q`) remains the
reference run; this runner is the fast gate with the same node set —
`--collect-only` output is printed as a count so a collection drift is
visible in the log.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def collect_nodes(extra: list[str]) -> list[str]:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q",
         "-p", "no:cacheprovider", *extra],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    nodes = [ln.strip() for ln in out.stdout.splitlines()
             if "::" in ln and not ln.startswith(("=", "<", " "))]
    if not nodes:
        sys.stderr.write(out.stdout[-2000:] + out.stderr[-2000:])
        raise SystemExit("ptest: collected zero test nodes")
    return nodes


def main() -> None:
    argv = sys.argv[1:]
    n = 8
    if argv and argv[0].isdigit():
        n, argv = int(argv[0]), argv[1:]
    t0 = time.time()
    nodes = collect_nodes(argv)
    print(f"ptest: {len(nodes)} nodes -> {n} shards", flush=True)
    shards = [nodes[i::n] for i in range(n)]
    # size each shard's Spark thread pool to roughly fill the box once
    cpus = os.cpu_count() or 8
    per = max(2, min(8, (cpus + n - 1) // n + 2))
    base = tempfile.mkdtemp(prefix="clx_ptest_")
    procs = []
    for i, shard in enumerate(shards):
        d = f"{base}/s{i}"
        os.makedirs(f"{d}/derby", exist_ok=True)
        env = dict(
            os.environ,
            CLX_TEST_MASTER=f"local[{per}]",
            CLX_WAREHOUSE_DIR=f"{d}/warehouse",
            CLX_DERBY_HOME=f"{d}/derby",
            CLX_DRIVER_MEM=os.environ.get("CLX_DRIVER_MEM", "6g"),
        )
        log = open(f"{d}.log", "w")
        procs.append((i, log, subprocess.Popen(
            [sys.executable, "-m", "pytest", *shard, "-q",
             "-p", "no:cacheprovider", f"--basetemp={d}/tmp", *argv],
            cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT,
        )))
    failed = 0
    for i, log, p in procs:
        rc = p.wait()
        log.close()
        tail = open(f"{base}/s{i}.log").read().strip().splitlines()
        summary = next(
            (ln for ln in reversed(tail) if "passed" in ln or "failed" in ln
             or "error" in ln), "(no summary)")
        print(f"shard {i}: rc={rc}  {summary}", flush=True)
        if rc != 0:
            failed += 1
            print(f"--- shard {i} tail ({base}/s{i}.log) ---")
            print("\n".join(tail[-30:]))
    mins = (time.time() - t0) / 60
    print(f"ptest: {n} shards in {mins:.1f} min, {failed} failed "
          f"(logs under {base})")
    if failed:
        sys.exit(1)
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
