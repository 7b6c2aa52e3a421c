#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate + DuckDB oracle timer.

Driver-side tooling only (duckdb/pyarrow/pandas are the ORACLE stack, not
engine dependencies). Two modes:

  verify:  python3 tools/verify_local.py verify <sfDir> <verifyOutDir>
           — for each <verifyOutDir>/<name>/ parquet dump produced by
           graft.Verify, run the matching oracle_sql.json query in DuckDB
           over the sf parquet tables and compare rows/schema/values.

  time:    python3 tools/verify_local.py time <sfDir> <verifyOutDir> [N]
           — run every oracle SQL N times (default 3) in DuckDB (threads =
           cpu count) and report per-query best-of-N + total, writing
           duckdb_times.json. This is the 2x-bar denominator.
"""
import glob
import json
import math
import os
import sys
import time

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir):
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    # pyarrow yields pandas.Timestamp for parquet reads but
    # datetime.datetime for duckdb arrow results — same instant, different
    # repr; normalize anything datetime-like to its ISO string
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


def table_key(tbl):
    """Column-name-sorted, row-order-preserving value dump (the driver
    hashes the same shape)."""
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    return cols, [tuple(norm_cell(col[i]) for col in data)
                  for i in range(tbl.num_rows)]


def load_spark(out_dir, name):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        return None
    return pq.read_table(files[0])


def cmd_verify(sf_dir, out_dir, only=None):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = connect(sf_dir)
    bad = 0
    names = sorted(oracle) if only is None else [n for n in sorted(oracle)
                                                if n in only]
    for name in names:
        spark_tbl = load_spark(out_dir, name)
        if spark_tbl is None:
            print(f"MISS  {name}: no spark dump")
            bad += 1
            continue
        try:
            duck_tbl = con.execute(oracle[name]).arrow()
        except Exception as e:
            print(f"ERR   {name}: duckdb: {e}")
            bad += 1
            continue
        sc, sv = table_key(spark_tbl)
        dc, dv = table_key(duck_tbl)
        if sc != dc:
            print(f"SCHEMA {name}: spark={sc} duck={dc}")
            bad += 1
        elif len(sv) != len(dv):
            print(f"ROWS  {name}: spark={len(sv)} duck={len(dv)}")
            bad += 1
        elif sv != dv:
            i = next(i for i in range(len(sv)) if sv[i] != dv[i])
            print(f"HASH  {name}: first diff row {i}:\n"
                  f"  spark={sv[i]}\n  duck ={dv[i]}")
            bad += 1
        else:
            print(f"ok    {name} ({len(sv)} rows)")
    print(f"\n{'FAILURES: ' + str(bad) if bad else 'ALL GREEN'} "
          f"({len(names)} checked)")
    return 1 if bad else 0


def cmd_time(sf_dir, out_dir, runs=3):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = connect(sf_dir)
    times = {}
    # warm-up pass (buffer pool, catalog)
    for name in sorted(oracle):
        try:
            con.execute(oracle[name]).fetchall()
        except Exception:
            pass
    for name in sorted(oracle):
        best = None
        for _ in range(runs):
            t0 = time.time()
            try:
                con.execute(oracle[name]).fetchall()
            except Exception as e:
                best = -1.0
                print(f"ERR {name}: {e}")
                break
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 4)
        print(f"{name:34s} {best:8.3f}")
    total = sum(v for v in times.values() if v >= 0)
    out = {"total_sec": round(total, 3), "n_queries": len(times),
           "runs": runs, "threads": os.cpu_count(), "sf_dir": sf_dir,
           "queries": times}
    with open("duckdb_times.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nDuckDB total (best-of-{runs}): {total:.1f}s "
          f"over {len(times)} queries -> duckdb_times.json")
    return 0


if __name__ == "__main__":
    mode, sf_dir, out_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    if mode == "verify":
        only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
        sys.exit(cmd_verify(sf_dir, out_dir, only))
    elif mode == "time":
        runs = int(sys.argv[4]) if len(sys.argv) > 4 else 3
        sys.exit(cmd_time(sf_dir, out_dir, runs))
    else:
        sys.exit(f"unknown mode {mode}")
