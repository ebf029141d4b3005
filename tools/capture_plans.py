#!/usr/bin/env python3
"""Capture ``explain("formatted")`` for registered queries into
``plans/r14/<name>_<tag>.txt`` (the optimization-round evidence files:
the judge reads these instead of running Spark).

Usage:
    python tools/capture_plans.py --tag before [--only name1,name2]
                                  [--sf /root/testdata/sf0.1]

Default query set is bench.BENCH_QUERIES (the headline harness).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--only", default="")
    ap.add_argument("--outdir", default=None)
    args = ap.parse_args()

    import bench
    import __spark_entry__ as entry_mod
    from dbscan_spark.session import get_spark

    spark = get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    names = (
        [n.strip() for n in args.only.split(",") if n.strip()]
        if args.only
        else list(bench.BENCH_QUERIES)
    )
    outdir = args.outdir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r14",
    )
    os.makedirs(outdir, exist_ok=True)
    failed = []
    try:
        for name in names:
            if name not in qs:
                failed.append((name, "not registered"))
                continue
            try:
                df = qs[name](spark, args.sf)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception as exc:  # noqa: BLE001 — record and continue
                failed.append((name, repr(exc)[:200]))
                continue
            path = os.path.join(outdir, f"{name}_{args.tag}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"wrote {path} ({len(plan)} chars)")
            spark.catalog.clearCache()
            # clearCache() does not free localCheckpoint blocks; the
            # KN5/classifier queries materialize checkpoints at
            # CONSTRUCTION time, so drop them between captures or a
            # multi-query loop accumulates storage until the stop().
            jsc = spark.sparkContext._jsc
            for rdd_id in list(jsc.getPersistentRDDs().keySet()):
                jsc.sc().unpersistRDD(rdd_id, True)
    finally:
        spark.stop()
    if failed:
        print("FAILED:", failed)
        sys.exit(1)


if __name__ == "__main__":
    main()
