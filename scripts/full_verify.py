"""Full local oracle-parity sweep -> FULLVERIFY_r{N}.json.

The driver's CORRECTNESS gate only covers the first 50 ``queries()``
entries per round; with >100 registered queries (112 as of the r10
continuation) the rest were previously attested only by prose ("local
parity sweep green"). This
script makes that half auditable: it runs EVERY registered query in a
plain (driver-like, untuned) SparkSession at sf0.01, compares each
against its DuckDB oracle exactly the way the driver does (row count +
column-name schema + order-insensitive value compare), and writes a
machine-readable artifact with the SAME per-query shape as
CORRECTNESS_r{N}.json:

    {"<query>": {"rows_match": bool, "schema_match": bool,
                 "hash_match": bool, "spark_rows": int,
                 "oracle_rows": int, "err": str | null}, ...}

Run at round close (r8 verdict ask #2):

    python scripts/full_verify.py --round 9        # -> FULLVERIFY_r9.json

The value compare normalizes exactly like the driver: floats rounded
to 6 places, NaN canonical, timestamps via isoformat, bytes via hex,
then rows sorted order-insensitively with (column, value) pairs sorted
within each row — so it is robust to column order and row order but
sensitive to any real value drift.

Artifact-staleness guard (r17 verdict "What's wrong" #1: the committed
FULLVERIFY_r17.json described a tree 14 commits older than the round's
final engine state): the artifact now records the exact HEAD it ran on
under the ``"_meta"`` key, and the script REFUSES to run on a dirty
working tree (uncommitted or untracked engine files would make the
recorded hash a lie) unless ``--allow-dirty`` is passed — in which case
the dirtiness is recorded into the artifact instead of hidden. The
round-close rule this enforces mechanically: regenerate FULLVERIFY as
the LAST commit of the round, after every engine-code change.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(round(v, 6))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)


def _multiset(cols, rows):
    return sorted(
        sorted((cols[i], _norm(r[i])) for i in range(len(cols))) for r in rows
    )


def _git(args: "list[str]") -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return subprocess.run(
        ["git", *args], cwd=repo, capture_output=True, text=True, check=True
    ).stdout.strip()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True, help="round number N")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None, help="override output path")
    ap.add_argument(
        "--allow-dirty", action="store_true",
        help="run despite uncommitted changes (recorded into the artifact)",
    )
    ap.add_argument("queries", nargs="*", help="subset (default: all)")
    args = ap.parse_args()
    out_path = args.out or f"FULLVERIFY_r{args.round}.json"

    head = _git(["rev-parse", "HEAD"])
    dirty = _git(["status", "--porcelain"])
    if dirty and not args.allow_dirty:
        print(
            "REFUSING: working tree is dirty — the artifact's recorded HEAD "
            "would not describe the code that actually ran. Commit first "
            "(the round-close rule: FULLVERIFY is the LAST commit of the "
            "round), or pass --allow-dirty to record the dirt instead:\n"
            + dirty,
            file=sys.stderr,
        )
        return 2

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    # Plain driver-like session: no engine tuning, so ANSI-mode /
    # parquet-nanos behavior matches what the external driver sees.
    spark = SparkSession.builder.master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.queries or list(queries)

    report: dict[str, dict] = {}
    failures = []
    t_start = time.time()
    for name in names:
        row = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        t0 = time.time()
        try:
            sdf = queries[name](spark, args.sf_dir)
            cols = sdf.columns
            rows = [tuple(r) for r in sdf.collect()]
            row["spark_rows"] = len(rows)
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            row["oracle_rows"] = len(drows)
            row["rows_match"] = len(rows) == len(drows)
            row["schema_match"] = sorted(cols) == sorted(dcols)
            row["hash_match"] = _multiset(cols, rows) == _multiset(dcols, drows)
        except Exception as exc:  # record, keep sweeping
            row["err"] = f"{type(exc).__name__}: {exc}"[:500]
        report[name] = row
        ok = row["rows_match"] and row["schema_match"] and row["hash_match"]
        if not ok:
            failures.append(name)
        print(
            f"[{name}] {'MATCH' if ok else 'FAIL'} "
            f"rows={row['spark_rows']}/{row['oracle_rows']} "
            f"({time.time() - t0:.1f}s)",
            flush=True,
        )

    # The staleness guard's receipt: the exact tree this sweep ran on.
    # Kept under a non-query key so per-query consumers can skip it.
    report["_meta"] = {
        "head": head,
        "dirty": bool(dirty),
        "round": args.round,
        "sf_dir": args.sf_dir,
        "queries_swept": len(names),
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(
        f"wrote {out_path}: {len(names) - len(failures)}/{len(names)} MATCH "
        f"in {time.time() - t_start:.0f}s on {head[:12]}"
        f"{' (DIRTY TREE)' if dirty else ''}; "
        f"failures: {failures or 'none'}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
