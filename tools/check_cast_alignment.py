#!/usr/bin/env python3
"""Cross-engine double->DECIMAL cast alignment check (round 15).

Spark casts a double to DECIMAL by rounding the double's SHORTEST
DECIMAL REPR half-up (BigDecimal.valueOf path); DuckDB's direct cast
rounds the EXACT BINARY VALUE. The two disagree by one unit exactly
when the shortest repr terminates ON a half-tie at the target scale —
overwhelmingly a float x float PRODUCT phenomenon (short combined
mantissas). The engine's oracles therefore snap float products through
VARCHAR (`Similarity.duckProd12`: DuckDB's double->VARCHAR is the same
shortest repr; its VARCHAR->DECIMAL rounds half-up) — see
docs/determinism.md, round-15 lessons.

This script re-validates both claims against the installed DuckDB:
  1. via-VARCHAR == Spark semantics on N random float products
     (direct-cast disagreements are counted for reference);
  2. raw corpus embedding floats never hit the scale-8 band (the
     Lloyd-mean sums' snap), at every test SF present.

Exit 1 if the via-VARCHAR path ever disagrees with Spark semantics or
a raw corpus float hits the band.

Usage: python3 tools/check_cast_alignment.py [n_products] [testdata_dir]
"""
import glob
import random
import struct
import sys

import duckdb
from decimal import Decimal, ROUND_HALF_UP


def spark_cast(p: float, scale: int) -> Decimal:
    """Spark's double->DECIMAL(_, scale): shortest repr, HALF_UP."""
    return Decimal(repr(p)).quantize(Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    data = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata"
    con = duckdb.connect()
    rc = 0

    random.seed(421)
    prods = []
    for _ in range(n):
        a = struct.unpack("f", struct.pack("f", random.uniform(-2, 2)))[0]
        b = struct.unpack("f", struct.pack("f", random.uniform(-2, 2)))[0]
        prods.append(a * b)
    con.execute("CREATE TABLE t AS SELECT * FROM (SELECT unnest(?) AS p)", [prods])
    rows = con.execute(
        "SELECT p, CAST(CAST(p AS VARCHAR) AS DECIMAL(28,12)),"
        "       CAST(p AS DECIMAL(28,12)) FROM t"
    ).fetchall()
    via_bad = [(p, v) for p, v, _ in rows if v != spark_cast(p, 12)]
    direct_bad = sum(1 for p, _, d in rows if d != spark_cast(p, 12))
    print(f"products: {len(rows)} checked; via-VARCHAR mismatches {len(via_bad)}; "
          f"direct-cast mismatches {direct_bad} (the band the VARCHAR path closes)")
    if via_bad:
        print("FAIL: via-VARCHAR disagreed with Spark semantics:", via_bad[:3])
        rc = 1

    for pq in sorted(glob.glob(f"{data}/sf*/embeddings.parquet")):
        rows = con.execute(
            "SELECT x, CAST(CAST(x AS DOUBLE) AS DECIMAL(18,8)) FROM "
            f"(SELECT unnest(embedding) AS x FROM read_parquet('{pq}'))"
        ).fetchall()
        bad = [(x, d) for x, d in rows if d != spark_cast(float(x), 8)]
        print(f"{pq}: {len(rows)} raw floats at scale 8; band hits {len(bad)}")
        if bad:
            print("FAIL: raw corpus float hit the scale-8 band — convert the "
                  "Lloyd-mean snap to the VARCHAR path:", bad[:3])
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
