#!/usr/bin/env python
"""Full-registry oracle sweep at an arbitrary data dir (default: the cached
10x-of-sf0.1 corpus) — the re-verification harness behind the SURVEY sweep
claims.  For every registered query it replays the driver comparison
(tests/oracle_harness.compare) and prints one status line; the final line is
a JSON summary.

Usage:
    python tools/sweep.py [--dir DIR] [--skip-heavy] [--only a,b,c]

--skip-heavy omits the three queries whose ORACLE side dominates sweep wall
time (b35_dedup_clusters 1334 s, b36_cosine_neardup 597 s, b35_jaccard_pairs
536 s at the 10x corpus — each is the oracle's all-pairs SQL, with the Spark
side a small fraction); use it for quick re-verification passes, and run the
full sweep (default) when recording a SURVEY claim.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

HEAVY_ORACLES = ("b35_dedup_clusters", "b36_cosine_neardup", "b35_jaccard_pairs")


def default_scale10_dir() -> str:
    import bench

    out, built = bench._scaled_dir_path("/root/testdata/sf0.1", 10, None)
    if not built:
        print(f"building 10x corpus at {out} ...", flush=True)
        bench._build_scaled_dir("/root/testdata/sf0.1", 10)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=None, help="data dir (default: cached 10x corpus)")
    ap.add_argument("--skip-heavy", action="store_true")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    args = ap.parse_args()

    data_dir = args.dir or default_scale10_dir()

    from oracle_harness import compare

    from ps_datalake_spark.registry import all_queries
    from ps_datalake_spark.session import get_spark

    specs = all_queries()
    names = list(specs)
    if args.only:
        names = [n for n in args.only.split(",") if n in specs]
    skipped = []
    if args.skip_heavy:
        skipped = [n for n in names if n in HEAVY_ORACLES]
        names = [n for n in names if n not in HEAVY_ORACLES]

    spark = get_spark(app_name="ps-datalake-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    t_start = time.time()
    ok, bad = [], {}
    for i, name in enumerate(names, 1):
        t0 = time.time()
        try:
            problems = compare(specs[name], spark, data_dir)
        except Exception as e:  # noqa: BLE001 — a sweep must record, not die
            problems = [f"{type(e).__name__}: {e}"]
        dt = round(time.time() - t0, 1)
        if problems:
            bad[name] = problems
            print(f"[{i}/{len(names)}] {name} FAIL ({dt}s): {problems}", flush=True)
        else:
            ok.append(name)
            print(f"[{i}/{len(names)}] {name} ok ({dt}s)", flush=True)
    spark.stop()
    summary = {
        "dir": data_dir,
        "total": len(names),
        "ok": len(ok),
        "fail": {n: p for n, p in bad.items()},
        "skipped_heavy": skipped,
        "wall_min": round((time.time() - t_start) / 60, 1),
    }
    print(json.dumps(summary))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
