#!/usr/bin/env python
"""Dump .explain('formatted') for every declared query (no execution)
and print a one-line plan-shape summary per query: Exchange count,
join strategies, Python-eval nodes, per-table scan counts (a scan of
the same parquet appearing N>1 times = an unshared subtree recomputed
N times), window/sort nodes. Used by the optimization rounds to pick
targets and to commit before/after plan artifacts.

Usage: python scripts/dump_plans.py OUTDIR [--only q1,q2]
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir = sys.argv[1]
    only = None
    for i, a in enumerate(sys.argv[2:], 2):
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
        elif a == "--only" and i + 1 < len(sys.argv):
            only = set(sys.argv[i + 1].split(","))
    os.makedirs(outdir, exist_ok=True)

    from node_js_etl_processor_spark.session import get_spark

    import __spark_entry__ as entrymod

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="dump_plans", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    for name, fn in entrymod.queries().items():
        if only is not None and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # pragma: no cover - diagnostic tool
            plan = f"PLAN ERROR: {e!r}"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        exch = len(re.findall(r"\bExchange\b", plan))
        # table scans: count per parquet file name
        scans = Counter(
            m.group(1)
            for m in re.finditer(r"Location:.*?/(\w+)\.parquet", plan)
        )
        joins = Counter(
            m.group(0)
            for m in re.finditer(
                r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"
                r"|BroadcastNestedLoopJoin|CartesianProduct",
                plan,
            )
        )
        py = Counter(
            m.group(0)
            for m in re.finditer(
                r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|"
                r"FlatMapGroupsInPandas",
                plan,
            )
        )
        wins = len(re.findall(r"\bWindow\b", plan))
        sorts = len(re.findall(r"^\s*\S*\s*Sort\b", plan, re.M))
        rescan = {t: n for t, n in scans.items() if n > 1}
        print(
            f"{name}\texch={exch}\twin={wins}\tsort={sorts}"
            f"\tjoins={dict(joins)}\tpy={dict(py)}"
            f"\tscans={dict(scans)}\trescan={rescan}"
        )

    spark.stop()


if __name__ == "__main__":
    main()
