#!/usr/bin/env python
"""Interleaved A/B of runtime SQL confs over registered queries.

Arm A = session defaults, arm B = the --conf overrides; each query runs
A,B,A,B,... n times per arm in ONE session and one weather window, with
per-run steal jiffies, so the comparison is immune to cross-window VM
drift (the round-13 measurement protocol). Only runtime-settable
spark.sql.* confs are valid here — session-level confs need a fresh
process.

Usage:
  python tools/ab_conf.py --conf spark.sql.adaptive.coalescePartitions.parallelismFirst=false \
      -n 3 doc_fuzzy_linkage_exact multimodal_near_dup
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crdb_changefeed_publisher_spark import plans
from crdb_changefeed_publisher_spark.session import DEFAULT_SF_DIR, get_spark


def steal() -> int:
    with open("/proc/stat") as fh:
        return int(fh.readline().split()[8])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--conf", action="append", default=[], help="k=v for arm B")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR))
    args = ap.parse_args()

    overrides = [c.split("=", 1) for c in args.conf]
    spark = get_spark("ab-conf")
    from crdb_changefeed_publisher_spark.plans import llm as _llm

    def fn_for(name):
        if name.startswith("_shared:"):
            return _llm.SHARED_PASSES[name.split(":", 1)[1]]
        spec = plans.all_specs().get(name) or plans.get_spec(name)
        return spec.fn

    defaults = {k: spark.conf.get(k, None) for k, _ in overrides}

    def set_arm(b: bool) -> None:
        for k, v in overrides:
            if b:
                spark.conf.set(k, v)
            elif defaults[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, defaults[k])

    spark.read.parquet(f"{args.sf}/region.parquet").write.format("noop").mode(
        "overwrite"
    ).save()

    for name in args.names:
        fn = fn_for(name)
        res: dict[str, list[float]] = {"A": [], "B": []}
        for i in range(args.n):
            for arm in ("A", "B"):
                set_arm(arm == "B")
                s0, t0 = steal(), time.time()
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
                dt, ds = time.time() - t0, steal() - s0
                res[arm].append(dt)
                print(f"{name} {arm}{i}: {dt:.3f}s steal={ds}", flush=True)
        set_arm(False)
        print(
            f"{name}  A min={min(res['A']):.3f} med={sorted(res['A'])[len(res['A'])//2]:.3f}"
            f"  B min={min(res['B']):.3f} med={sorted(res['B'])[len(res['B'])//2]:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
