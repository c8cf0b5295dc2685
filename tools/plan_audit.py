#!/usr/bin/env python
"""Physical-plan audit: for every registered (and optionally retired) query,
print a one-line digest of the plan shapes that matter at 100 TB —
exchanges (shuffles), broadcast joins, sort-merge joins, whole-stage-codegen
spans, Arrow-batched Python stages, scans with pushed filters, and the two
forbidden shapes (CartesianProduct / row-at-a-time BatchEvalPython, also
asserted absent by tests/test_plans.py).

This is the reviewable artifact behind the plan-shape claims: run it after
changing any operator and diff the digest.

Usage: python tools/plan_audit.py [--retired] [--md docs/PLANS.md] [query ...]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crdb_changefeed_publisher_spark import plans
from crdb_changefeed_publisher_spark.session import DEFAULT_SF_DIR, get_spark

MARKS = [
    ("exch", r"Exchange (?:hash|range|SinglePartition)"),
    ("bcast", r"BroadcastHashJoin|BroadcastNestedLoopJoin"),
    ("smj", r"SortMergeJoin"),
    ("wsc", r"\*\(\d+\)|WholeStageCodegen"),
    ("arrow", r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|FlatMapCoGroupsInPandas"),
    ("pushed", r"PushedFilters: \[[^\]]"),
    ("CARTESIAN", r"CartesianProduct"),
    ("ROWPY", r"BatchEvalPython"),
]


def digest(plan: str) -> dict[str, int]:
    return {name: len(re.findall(pat, plan)) for name, pat in MARKS}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--retired", action="store_true", help="audit retired specs too")
    ap.add_argument("--md", default=None, help="also write a markdown table here")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR))
    ap.add_argument(
        "--no-run",
        action="store_true",
        help="digest the pre-execution plan (faster, but AQE plans only "
        "annotate whole-stage-codegen spans in their FINAL plan, so the "
        "wsc column undercounts)",
    )
    args = ap.parse_args()

    spark = get_spark("plan-audit")
    specs = dict(plans.all_specs())
    if args.retired:
        specs.update(plans.retired_specs())
    names = args.queries or sorted(specs)

    header = f"{'query':<34} " + " ".join(f"{n:>9}" for n, _ in MARKS)
    lines = [header]
    md = ["| query | " + " | ".join(n for n, _ in MARKS) + " |",
          "|" + "---|" * (len(MARKS) + 1)]
    forbidden: list[str] = []
    for name in names:
        spec = specs.get(name) or plans.get_spec(name)
        try:
            df = spec.fn(spark, args.sf)
            if not args.no_run:
                # drive THIS DataFrame's own QueryExecution to completion so
                # AQE reaches its FINAL plan (a noop .write would execute a
                # separate QueryExecution and leave this one pre-adaptive);
                # audit runs at small SF, so the driver-side rows are tiny
                df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
            # final adaptive plans append an "== Initial Plan ==" section
            # that would double-count every mark
            plan = plan.split("== Initial Plan ==")[0]
        except Exception as e:  # noqa: BLE001
            lines.append(f"{name:<34} ERROR {e}")
            continue
        d = digest(plan)
        if d["CARTESIAN"] or d["ROWPY"]:
            forbidden.append(name)
        lines.append(f"{name:<34} " + " ".join(f"{d[n]:>9}" for n, _ in MARKS))
        md.append(f"| {name} | " + " | ".join(str(d[n]) for n, _ in MARKS) + " |")
    print("\n".join(lines))
    if forbidden:
        print(f"\nWARNING: forbidden plan shapes in: {forbidden}", file=sys.stderr)
    if args.md:
        with open(args.md, "w") as fh:
            fh.write("# Physical-plan digest (tools/plan_audit.py)\n\n")
            fh.write(f"Scale factor dir: `{args.sf}`. Columns: exchange count, "
                     "broadcast joins, sort-merge joins, whole-stage-codegen "
                     "spans, Arrow-batched Python stages, scans with pushed "
                     "filters, and the forbidden CartesianProduct / "
                     "BatchEvalPython (must be 0).\n\n")
            fh.write("\n".join(md) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
