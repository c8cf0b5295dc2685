#!/usr/bin/env python
"""Scaling-curve report: time every registered query at sf0.001 / sf0.01 /
sf0.1 (100x data growth end to end) and print per-query times plus the
sf0.01 -> sf0.1 growth ratio.

Reading the ratio (data grows 10x between those two points):
  * ratio <= ~1.5 — fixed overhead dominates (scheduling, JVM, plan);
    the query hasn't hit its data term yet at these SFs.
  * ratio ~ 2-10 — sublinear-to-linear in data: the shape that survives a
    100x scale-up (shuffles are partial-agg'd, joins are bucketed/
    broadcast, no quadratic stage).
  * ratio >> 10 — superlinear: a pair join, window funnel, or skewed block
    is growing faster than the data. Investigate before trusting at scale.

min-of-2 per (query, sf) for the same stall-robustness reasoning as
bench.py; run in a quiet window (check bench.py's calibration_factor).

Usage: python tools/scaling_curve.py [--json out.json] [--sf1 DIR] [query ...]

--sf1 adds a fourth decade (the locally generated stress tier from
tools/make_sf1.py) and reports the sf0.1 -> sf1 growth ratio alongside
the sf0.01 -> sf0.1 one — two independent 10x steps catch a quadratic
term that one step can hide behind fixed overhead. --sf10 adds a FIFTH
decade (make_sf1.py --scale 100) and the sf1 -> sf10 ratio: every dial
bug found so far (srp bits, simhash output bound, kmeans k, bloom
literals, IVF probes) was invisible one decade below where it bit.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crdb_changefeed_publisher_spark import plans
from crdb_changefeed_publisher_spark.session import get_spark

SFS = ["0.001", "0.01", "0.1"]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="default: every registered query")
    ap.add_argument("--json", default=None, help="also write machine-readable output here")
    ap.add_argument(
        "--sf1",
        default=None,
        help="path to an sf1 tier (tools/make_sf1.py output); adds a 4th column",
    )
    ap.add_argument(
        "--sf10",
        default=None,
        help="path to an sf10 tier (make_sf1.py --scale 100); adds a 5th column",
    )
    args = ap.parse_args()
    sfs = list(SFS)
    sf_dirs = {sf: f"/root/testdata/sf{sf}" for sf in sfs}
    if args.sf1:
        sfs.append("1")
        sf_dirs["1"] = args.sf1
    if args.sf10:
        assert args.sf1, "--sf10 needs --sf1 (the ratio is sf1 -> sf10)"
        sfs.append("10")
        sf_dirs["10"] = args.sf10

    spark = get_spark("scaling-curve")
    materialize(spark.read.parquet("/root/testdata/sf0.001/region.parquet"))

    specs = plans.all_specs()
    names = args.queries or sorted(specs)
    rows: dict[str, dict[str, float]] = {}
    for name in names:
        spec = specs[name] if name in specs else plans.get_spec(name)
        rows[name] = {}
        for sf in sfs:
            sf_dir = sf_dirs[sf]

            def once() -> float:
                t0 = time.time()
                materialize(spec.fn(spark, sf_dir))
                return time.time() - t0

            try:
                rows[name][sf] = round(min(once(), once()), 2)
            except Exception as e:  # noqa: BLE001
                print(f"error {name}@sf{sf}: {e}", file=sys.stderr)
                rows[name][sf] = -1.0

    hdr = f"{'query':<34} {'sf0.001':>8} {'sf0.01':>8} {'sf0.1':>8} {'x(.01->.1)':>10}"
    if args.sf1:
        hdr += f" {'sf1':>8} {'x(.1->1)':>9}"
    if args.sf10:
        hdr += f" {'sf10':>8} {'x(1->10)':>9}"
    print(hdr)
    ratios, ratios1, ratios10 = [], [], []
    for name in names:
        r = rows[name]
        ratio = round(r["0.1"] / r["0.01"], 1) if r["0.01"] > 0 and r["0.1"] > 0 else float("nan")
        if ratio == ratio:
            ratios.append(ratio)
        line = f"{name:<34} {r['0.001']:>8.2f} {r['0.01']:>8.2f} {r['0.1']:>8.2f} {ratio:>10}"
        if args.sf1:
            ratio1 = round(r["1"] / r["0.1"], 1) if r["0.1"] > 0 and r.get("1", -1) > 0 else float("nan")
            if ratio1 == ratio1:
                ratios1.append(ratio1)
            line += f" {r.get('1', -1.0):>8.2f} {ratio1:>9}"
        if args.sf10:
            ratio10 = round(r["10"] / r["1"], 1) if r.get("1", -1) > 0 and r.get("10", -1) > 0 else float("nan")
            if ratio10 == ratio10:
                ratios10.append(ratio10)
            line += f" {r.get('10', -1.0):>8.2f} {ratio10:>9}"
        print(line)
    if ratios:
        ratios.sort()
        med = ratios[len(ratios) // 2]
        print(f"\nmedian 10x-data growth ratio (.01->.1): {med}  (max {max(ratios)})")
    if ratios1:
        ratios1.sort()
        med1 = ratios1[len(ratios1) // 2]
        print(f"median 10x-data growth ratio (.1->1):  {med1}  (max {max(ratios1)})")
    if ratios10:
        ratios10.sort()
        med10 = ratios10[len(ratios10) // 2]
        print(f"median 10x-data growth ratio (1->10):  {med10}  (max {max(ratios10)})")
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(rows, fh, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
