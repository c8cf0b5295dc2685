#!/usr/bin/env python
"""Time one or more registered queries (or shared passes) with the noop sink.

Prints per-run wall seconds plus the steal-jiffies delta per run, so an A/B
inside one weather window is readable. Shared passes are named
`_shared:<name>`; `--fresh-session` tears the session down between queries
(to re-pay session-shared builds); default reuses one session so repeated
runs measure the marginal query cost, exactly like bench.py.

Usage: python tools/time_query.py [-n 3] name [name ...]
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
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR))
    args = ap.parse_args()

    spark = get_spark("time-query")
    from crdb_changefeed_publisher_spark.plans import llm as _llm

    def fn_for(name):
        if name.startswith("_shared:"):
            return _llm.SHARED_PASSES[name.split(":", 1)[1]]
        spec = plans.all_specs().get(name) or plans.get_spec(name)
        return spec.fn

    # warm the JVM once
    spark.read.parquet(f"{args.sf}/region.parquet").write.format("noop").mode(
        "overwrite"
    ).save()

    for name in args.names:
        fn = fn_for(name)
        times = []
        for i in range(args.n):
            s0, t0 = steal(), time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            dt, ds = time.time() - t0, steal() - s0
            times.append(dt)
            print(f"{name} run{i}: {dt:.3f}s steal={ds}", flush=True)
        print(f"{name} min={min(times):.3f}s", flush=True)


if __name__ == "__main__":
    main()
