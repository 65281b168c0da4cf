#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tool only; the
shipped library is pure Scala/Spark). Runs DuckDB on oracle_sql.json and
compares each query's parquet dump: sorted columns by name, sorted rows,
value-level compare.

Usage: check.py <verify_out_dir> <sf_dir> [--partial]

Refuses a dump produced under SPARK_GRAFT_ONLY (marked _PARTIAL_RUN)
unless --partial is passed: a filtered dump passing vacuously must never
be mistaken for the full gate.
"""
import os, sys, json, glob, math
from decimal import Decimal

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, bytes):
        return ("b", v.hex())
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    if isinstance(v, list):
        return ("l", tuple(norm(x) for x in v))
    return v


def rows_of(table):
    cols = sorted(table.column_names)
    data = [table.column(c).to_pylist() for c in cols]
    return cols, sorted(
        (tuple(norm(col[i]) for col in data) for i in range(table.num_rows)),
        key=repr)


def main(outdir, sfdir, partial=False):
    kept = None
    if os.path.exists(f"{outdir}/_PARTIAL_RUN"):
        marker = open(f"{outdir}/_PARTIAL_RUN").read().split()
        if marker == ["FULL_RUN_IN_PROGRESS"]:
            # a full Verify run started here and never finished — the
            # directory is half-written regardless of --partial
            print("REFUSED: a FULL Verify run crashed mid-dump here "
                  "(see _PARTIAL_RUN sentinel); re-run Verify")
            return 1
        if not partial:
            print("REFUSED: dump was produced under SPARK_GRAFT_ONLY "
                  "(see _PARTIAL_RUN); re-run Verify unfiltered or pass --partial")
            return 1
        kept = set(marker)
        print(f"*** PARTIAL run: checking only {len(kept)} filtered queries ***")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = bad = 0
    for name in sorted(oracle):
        if kept is not None and name not in kept:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            bad += 1
            continue
        try:
            scols, srows = rows_of(pq.read_table(files))
            dcols, drows = rows_of(con.sql(oracle[name]).fetch_arrow_table())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            bad += 1
            continue
        if scols != dcols:
            print(f"FAIL {name}: columns spark={scols} duck={dcols}")
            bad += 1
        elif len(srows) != len(drows):
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
            bad += 1
        elif srows != drows:
            diffs = [i for i, (a, b) in enumerate(zip(srows, drows)) if a != b]
            i = diffs[0]
            print(f"FAIL {name}: {len(diffs)}/{len(srows)} rows differ; first @{i}:")
            print(f"  spark: {srows[i]}")
            print(f"  duck : {drows[i]}")
            bad += 1
        else:
            print(f"OK   {name} ({len(srows)} rows)")
            ok += 1
    print(f"== {ok} ok, {bad} fail ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], partial="--partial" in sys.argv[3:]))
