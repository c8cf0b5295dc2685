#!/usr/bin/env python
"""Dump `.explain("formatted")` output for registered queries to files.

Writes plans/<tag>/<query>_<suffix>.txt for every registered query (or the
subset named on the command line): the formatted pre-execution plan, plus —
unless --no-run — the final adaptive executed plan (AQE re-plans shuffles at
runtime, so the executed plan is the one whose shape claims mean anything).

Usage: python tools/dump_plans.py --tag r13 --suffix before [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crdb_changefeed_publisher_spark import plans
from crdb_changefeed_publisher_spark.session import DEFAULT_SF_DIR, get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR))
    ap.add_argument("--out-root", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans"))
    ap.add_argument("--no-run", action="store_true", help="skip executing (no final AQE plan)")
    args = ap.parse_args()

    out_dir = os.path.join(args.out_root, args.tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("dump-plans")
    specs = dict(plans.all_specs())
    names = args.queries or sorted(specs)

    for name in names:
        spec = specs.get(name) or plans.get_spec(name)
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        try:
            df = spec.fn(spark, args.sf)
            formatted = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            sections = [f"== explain(formatted), sf_dir={args.sf} ==\n", formatted]
            if not args.no_run:
                df.collect()
                final = df._jdf.queryExecution().executedPlan().toString()
                final = final.split("== Initial Plan ==")[0]
                sections += ["\n== final adaptive executed plan ==\n", final]
            with open(path, "w") as fh:
                fh.write("\n".join(sections))
            print(f"wrote {path}")
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
