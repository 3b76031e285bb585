#!/usr/bin/env python
"""Interleaved A/B timing harness under the driver's bench protocol.

Times one or more registered queries (or ad-hoc builder callables passed by a
driver script importing this module) the exact way bench.py does: fresh
`get_spark` session, `_pretouch`, `_apply_profile(aqe=True)`, noop-write
`_force`, warmups, then N interleaved min-merged rounds — variants alternate
WITHIN each round so host drift hits all variants equally (the BASELINE.md
round-9 protocol rule: never time a reused DataFrame with collect()).

Usage (registered queries):
    python tools/ab.py --dir /tmp/..._scale10_dir --queries b64_bm25_topk
    python tools/ab.py --dir DIR --queries a,b --rounds 3 --timed 3

For code variants, import run_ab from a scratch script:
    from tools.ab import run_ab
    run_ab({"baseline": lambda spark, d: ..., "packed": ...}, data_dir)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from ps_datalake_spark.session import get_spark  # noqa: E402


def run_ab(
    variants: dict,
    data_dir: str,
    rounds: int = 3,
    timed: int = 3,
    warmups: int = 2,
    eager: bool = False,
    cpus: int | None = None,
) -> dict[str, float]:
    """Interleaved min-merge timing of {name: build(spark, dir)} variants."""
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="ab-harness")
    bench._pretouch(data_dir)
    bench._apply_profile(spark, data_dir, cpus, aqe=True)
    if eager:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 << 20))
    best: dict[str, float] = {k: float("inf") for k in variants}
    # warmup every variant first (codegen + JIT + page cache)
    for name, build in variants.items():
        for _ in range(warmups):
            if eager:
                bench._force(build(spark, data_dir))
                spark.catalog.clearCache()
            else:
                bench._force(build(spark, data_dir))
    for r in range(rounds):
        for name, build in variants.items():
            for _ in range(timed):
                if eager:
                    t0 = time.perf_counter()
                    bench._force(build(spark, data_dir))
                    dt = time.perf_counter() - t0
                    spark.catalog.clearCache()
                else:
                    df = build(spark, data_dir)
                    t0 = time.perf_counter()
                    bench._force(df)
                    dt = time.perf_counter() - t0
                best[name] = min(best[name], dt)
            print(f"round {r} {name}: best {best[name]:.3f}s", flush=True)
    spark.stop()
    print({k: round(v, 3) for k, v in best.items()}, flush=True)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--timed", type=int, default=3)
    ap.add_argument("--eager", action="store_true")
    args = ap.parse_args()
    from ps_datalake_spark.registry import all_queries

    specs = all_queries()
    variants = {n: specs[n].build for n in args.queries.split(",") if n}
    run_ab(variants, args.dir, rounds=args.rounds, timed=args.timed,
           eager=args.eager)


if __name__ == "__main__":
    main()
