#!/usr/bin/env python
"""Oracle-verify a subset of declared queries, driver-style: plain
SparkSession (no engine configs), DuckDB oracle, order-insensitive
row compare. Usage: python scripts/verify_subset.py q1,q2 [sfdir...]
With no sfdir args, checks /root/testdata/sf0.001 and sf0.01.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(round(v, 6))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)


def main() -> None:
    names = [s for s in sys.argv[1].split(",") if s]
    sf_dirs = sys.argv[2:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
    ]

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = SparkSession.builder.master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Q, O = E.queries(), E.oracle_sql()
    fails = []
    for sf in sf_dirs:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')"
            )
        for name in names:
            t0 = time.time()
            sdf = Q[name](spark, sf)
            cols = sdf.columns
            rows = [tuple(r) for r in sdf.collect()]
            res = con.execute(O[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            sm = sorted(
                sorted((cols[i], norm(r[i])) for i in range(len(cols)))
                for r in rows
            )
            dm = sorted(
                sorted((dcols[i], norm(r[i])) for i in range(len(dcols)))
                for r in drows
            )
            ok = sm == dm
            if not ok:
                fails.append((sf, name))
            print(
                f"[{os.path.basename(sf)}:{name}] rows={len(rows)} "
                f"ORACLE={'MATCH' if ok else 'MISMATCH'} "
                f"({time.time() - t0:.1f}s)"
            )
    print("FAILURES:", fails if fails else "none")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
