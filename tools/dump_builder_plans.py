#!/usr/bin/env python
"""Capture explain("formatted") of the BUILDER JOBS of checkpointed pipelines.

A pipeline that ends in localCheckpoint/persist commits only a
`Scan ExistingRDD` stub as its final plan, so the plan evidence for the jobs
that do the real work was previously uncapturable (r12 verdict #4: the
shipped b64 exchange never appeared in any committed plan).  Query builders
and operators now call `_util.dump_plan(df, name)` immediately before each
materialization barrier; that helper writes the formatted plan to
$PSDL_PLAN_DUMP/<name>.txt when the env var is set and is a no-op otherwise.

This tool sets the env var per query, builds the query (executing eager
builders), and collects final.txt (the returned DataFrame's plan) alongside
whatever barrier plans the build emitted.

Usage:
    python tools/dump_builder_plans.py --out plans/r13/builder \
        [--dir /root/testdata/sf0.01] [--heavy] query [query ...]

--heavy applies the bench's eager-builder profile (AQE on, 128 MB splits,
input-sized shuffle partitions) so the captured plans match the plans the
bench times for EAGER_BUILDERS.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    ap.add_argument("--heavy", action="store_true")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from ps_datalake_spark.registry import all_queries
    from ps_datalake_spark.session import get_spark

    spark = get_spark(app_name="dump-builder-plans")
    spark.sparkContext.setLogLevel("ERROR")
    if args.heavy:
        import bench

        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 << 20))
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(bench._auto_partitions(args.dir, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))),
        )
    specs = all_queries()
    for name in args.queries:
        out_dir = os.path.join(args.out, name)
        os.makedirs(out_dir, exist_ok=True)
        os.environ["PSDL_PLAN_DUMP"] = out_dir
        try:
            df = specs[name].build(spark, args.dir)
            with open(os.path.join(out_dir, "final.txt"), "w") as f:
                f.write(plan_text(df))
            print(f"{name}: {sorted(os.listdir(out_dir))}", flush=True)
        except Exception as e:
            print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)
        finally:
            os.environ.pop("PSDL_PLAN_DUMP", None)
    spark.stop()


if __name__ == "__main__":
    main()
