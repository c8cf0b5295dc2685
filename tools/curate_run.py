#!/usr/bin/env python
"""Run the end-to-end corpus curation pipeline and materialize its outputs —
the operational entry point a data team would schedule:

    curated corpus  -> <out>/corpus/   (parquet, partitioned by language)
    per-lang report -> <out>/report/   (parquet)
    run summary     -> one JSON line on stdout

Usage:
    python tools/curate_run.py --sf-dir /root/testdata/sf0.01 --out /tmp/curated \
        [--drop-repetitive] [--quality-min 0.2] [--contamination-max 0.05]

Partitioning by language keeps downstream per-language reads partition-pruned
(the same write-time layout argument as the IVF cell partitioning in
docs/SCALE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    ap.add_argument("--quality-min", type=float, default=0.2)
    ap.add_argument("--contamination-max", type=float, default=0.05)
    ap.add_argument("--drop-repetitive", action="store_true")
    args = ap.parse_args()

    from crdb_changefeed_publisher_spark.operators import curate
    from crdb_changefeed_publisher_spark.session import get_spark
    from crdb_changefeed_publisher_spark.tables import load_table

    spark = get_spark("curate_run")
    docs = load_table(spark, args.sf_dir, "documents")
    curated = curate.curate_corpus(
        docs,
        contamination_max=args.contamination_max,
        quality_min=args.quality_min,
        drop_repetitive=args.drop_repetitive,
    )
    corpus_dir = os.path.join(args.out, "corpus")
    report_dir = os.path.join(args.out, "report")
    curated.write.mode("overwrite").partitionBy("lang").parquet(corpus_dir)

    kept = spark.read.parquet(corpus_dir)
    report = curate.curation_report(docs, kept)
    report.write.mode("overwrite").parquet(report_dir)

    rows = report.collect()
    summary = {
        "metric": "curation_run",
        "sf_dir": args.sf_dir,
        "docs_in": int(sum(r.n_docs_in for r in rows)),
        "docs_kept": int(sum(r.n_docs_kept for r in rows)),
        "tokens_kept": int(sum(r.tokens_kept for r in rows)),
        "drop_repetitive": bool(args.drop_repetitive),
        "out": args.out,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
