#!/usr/bin/env python
"""Dump `explain("formatted")` for every registered query and audit the plans
for the optimization-guide anti-patterns (r12 optimization round).

For each query in the registry this builds the DataFrame against --dir,
captures the formatted physical plan to --out/<name>.txt, and records a
per-plan audit row:

  * exchanges        — count of Exchange nodes (shuffle boundaries)
  * batch_eval_py    — BatchEvalPython nodes (row-at-a-time Python UDFs)
  * arrow_eval_py    — ArrowEvalPython / MapInArrow / MapInPandas /
                       FlatMapGroupsInPandas nodes (vectorized boundary)
  * cartesian        — CartesianProduct / BroadcastNestedLoopJoin nodes
  * smj / shj / bhj  — join strategy counts
  * scans_no_pushed  — parquet scans whose PushedFilters is empty while the
                       plan contains a Filter above them (possible missed
                       pushdown; heuristic, verify by eye)
  * read_widths      — per-scan ReadSchema column counts (column pruning)

The final line is a JSON summary sorted by (batch_eval_py, cartesian,
exchanges) so the worst plans float to the top.

Usage:
    python tools/plan_audit.py [--dir /root/testdata/sf0.01] \
        [--out plans/r12/audit] [--only a,b,c] [--skip-eager]

Builders that do eager work (store puts, stream runs, checkpoint pipelines)
still execute it during plan capture; --skip-eager lists them out when only
the lazy plans are wanted.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Builders whose build() performs eager work (mirrors bench.EAGER_BUILDERS
# plus the streaming foreachBatch families): plan capture executes them.
EAGER_HINT = re.compile(
    r"b35_|b38_|b42_|b64_bm25|b89_|b90_|b91_|b92_|b30_|b31_|b32_|b33_|b63_stream"
)


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(plan: str) -> dict:
    def n(pat: str) -> int:
        return len(re.findall(pat, plan))

    # scans with empty PushedFilters while a Filter node exists anywhere
    scans_no_pushed = 0
    for m in re.finditer(r"PushedFilters: \[\]", plan):
        scans_no_pushed += 1
    has_filter = bool(re.search(r"\bFilter\b", plan))
    widths = [
        s.count(",") + 1
        for s in re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        if s.strip()
    ]
    return {
        # real shuffle boundaries only: match the formatted-plan node header
        # "(k) Exchange" so ReusedExchange / BroadcastExchange never count
        # (ADVICE r12: \bExchange\b cannot match inside "ReusedExchange" —
        # no word boundary mid-token — so the old subtraction double-
        # discounted reuse and could go negative)
        "exchanges": len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M)),
        "reused_exchanges": n(r"ReusedExchange"),
        "batch_eval_py": n(r"BatchEvalPython"),
        "arrow_eval_py": n(r"ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas"),
        "cartesian": n(r"CartesianProduct|BroadcastNestedLoopJoin"),
        "smj": n(r"SortMergeJoin"),
        "shj": n(r"ShuffledHashJoin"),
        "bhj": n(r"BroadcastHashJoin"),
        "sorts": n(r"\bSort\b"),
        "scans_no_pushed": scans_no_pushed if has_filter else 0,
        "read_widths": widths,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=os.path.join(REPO, "plans", "r12", "audit"))
    ap.add_argument("--only", default="")
    ap.add_argument("--skip-eager", action="store_true")
    args = ap.parse_args()

    from ps_datalake_spark.registry import all_queries
    from ps_datalake_spark.session import get_spark

    os.makedirs(args.out, exist_ok=True)
    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    names = [n for n in (args.only.split(",") if args.only else specs) if n]
    rows: dict[str, dict] = {}
    for name in names:
        if args.skip_eager and EAGER_HINT.search(name):
            continue
        t0 = time.time()
        try:
            df = specs[name].build(spark, args.dir)
            plan = plan_text(df)
            with open(os.path.join(args.out, f"{name}.txt"), "w") as f:
                f.write(plan)
            rows[name] = audit(plan)
            rows[name]["build_sec"] = round(time.time() - t0, 1)
            print(f"{name}: {json.dumps(rows[name])}", flush=True)
        except Exception as e:  # record, keep sweeping
            rows[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)
    worst = sorted(
        (n for n in rows if "error" not in rows[n]),
        key=lambda n: (
            rows[n]["batch_eval_py"],
            rows[n]["cartesian"],
            rows[n]["exchanges"],
        ),
        reverse=True,
    )
    print(json.dumps({
        "n": len(rows),
        "errors": [n for n in rows if "error" in rows[n]],
        "worst10": {n: rows[n] for n in worst[:10]},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
