"""Simulate the driver's CORRECTNESS gate locally.

Runs the first N registered queries() entries at a chosen SF against their
DuckDB oracle_sql() twins, using the same comparison shape the driver uses:
row count + sorted-column schema + order-insensitive value hash, with the
canonicalization done via ``pandas.DataFrame.sort_values`` over every
column — the exact step that raised ``TypeError: unhashable type: 'list'``
on array-typed outputs in CORRECTNESS_r02, so any output shape the driver
cannot grade crashes here too.

Usage:  python tools/driver_sim.py [--sf /root/testdata/sf0.01] [--first 50]
        [--only name1,name2]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def _canon(df: pd.DataFrame) -> str:
    """Driver-shaped canonicalization: sort columns by name, sort rows by
    every column (pandas sort_values — crashes on unhashable cells, by
    design), round floats, stringify, hash."""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    cells = []
    for row in df.itertuples(index=False):
        out = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
                out.append("\x00")
            elif isinstance(v, (np.floating, float)):
                out.append(f"{round(float(v), 6):.6f}")
            elif isinstance(v, (np.integer, int)) and not isinstance(v, bool):
                out.append(str(int(v)))
            elif isinstance(v, pd.Timestamp):
                out.append(v.isoformat())
            else:
                out.append(str(v))
        cells.append("\x01".join(out))
    cells.sort()
    return hashlib.sha256("\x02".join(cells).encode()).hexdigest()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--first", type=int, default=50)
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    # absolute, like the real driver: events_stream_dir symlinks the
    # events parquet with the GIVEN path as the target, and a relative
    # target resolves from the /tmp link dir and dangles — the file
    # stream then reads zero files and every file-stream query
    # "mismatches" (r13 false alarm: 8 reds that vanished with an
    # absolute --sf)
    args.sf = os.path.abspath(args.sf)

    import __spark_entry__ as entry_mod
    from dbscan_spark.io import TABLES
    from dbscan_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    names = list(qs)[: args.first]
    if args.only:
        names = [n for n in args.only.split(",") if n in qs]

    results: dict[str, dict] = {}
    t_total = time.time()
    for name in names:
        t0 = time.time()
        rec: dict = {}
        try:
            got = qs[name](spark, args.sf).toPandas()
            rec["spark_rows"] = int(got.shape[0])
            if name in oracles:
                want = con.sql(oracles[name]).df()
                rec["oracle_rows"] = int(want.shape[0])
                rec["rows_match"] = got.shape[0] == want.shape[0]
                rec["schema_match"] = sorted(got.columns) == sorted(want.columns)
                rec["hash_match"] = (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and _canon(got) == _canon(want)
                )
            else:
                _canon(got)  # rows-only still goes through the canonicalizer
                rec["err"] = "no_oracle"
        except Exception:
            rec["err"] = traceback.format_exc(limit=3)
        rec["sec"] = round(time.time() - t0, 2)
        results[name] = rec
        # sweep blocks the query persisted but left for the session to
        # reclaim — a full 228-query grading session otherwise
        # accumulates every query's cached tables (ADVICE r8)
        spark.catalog.clearCache()
        err = rec.get("err")
        if err is not None and err != "no_oracle":
            status = "ERR"
        elif err == "no_oracle":
            status = "rows-only"
        else:
            status = "OK" if rec.get("hash_match") else "MISMATCH"
        print(f"{name:40s} {status:9s} {rec['sec']:6.2f}s", flush=True)

    bad = [
        n
        for n, r in results.items()
        if (r.get("err") not in (None, "no_oracle"))
        or (r.get("err") is None and not r.get("hash_match"))
    ]
    print(f"\ntotal {time.time()-t_total:.1f}s; {len(names)} graded; bad: {bad}")
    with open("/tmp/driver_sim.json", "w") as f:
        json.dump(results, f, indent=1)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
