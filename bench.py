#!/usr/bin/env python
"""Benchmark harness: times every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is forced with the noop sink (df.write.format("noop")) so
timings measure the full distributed plan — scan, shuffle, agg — and
not Python row-transfer via collect(). Queries whose semantics are a
driver-side result (top-k limits) still run their full plan under noop.

Each query is timed as the MEDIAN of $SPARK_GRAFT_BENCH_RUNS (default
3) measured runs after one untimed warm-up, so round-over-round deltas
reflect plan changes rather than JIT/GC noise; the total is the sum of
per-query medians.

Global warm-up (r18): a fixed basket of diverse queries runs untimed
BEFORE the sweep. The r18 watch investigation found the per-query
warm-up alone does not isolate timings from SWEEP POSITION: the first
~15 queries of a fresh session measured a median 1.33x their values
from rounds where the same queries (identical code since r9, bitwise-
identical data by the row-count proxy) sat later in the registry order
— a JVM/codegen/Python-worker warm-up curve, decaying to 0.87x at the
sweep tail. The basket front-loads that machinery (parquet scan,
hash agg, window, joins, regex/string kernels, Arrow/Pandas workers)
so a query's measurement no longer depends on where the rotation put
it in the registry. Applies to --only runs too — that is what makes
solo medians comparable to sweep medians.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))


def _only() -> "set[str] | None":
    """Optional --only=name1,name2 (or --only name1,name2) filter:
    time just those queries, solo in a fresh session — the
    instrumentation form the perf-watch artifacts use. The driver
    invokes bench.py with no args, so the default full sweep is
    unchanged; with a filter, bench_out.json is NOT overwritten (the
    committed artifact stays the full sweep)."""
    args = sys.argv[1:]
    for i, a in enumerate(args):
        if a.startswith("--only="):
            return {s for s in a.split("=", 1)[1].split(",") if s}
        if a == "--only" and i + 1 < len(args):
            return {s for s in args[i + 1].split(",") if s}
    return None


def main() -> None:
    from node_js_etl_processor_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    m = re.search(r"sf([\d.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None

    only = _only()
    queries = entrymod.queries()
    # Global warm-up basket (see module docstring): diverse engine
    # machinery, untimed, fixed across rounds so the steady state every
    # query measures from is position-independent.
    warmup = [
        "q_agg_pricing",        # parquet scan + partial/final hash agg
        "q_window_lag",         # window exchange + codegen window fns
        "q_join_enrich",        # broadcast + shuffled joins
        "q_sessionize",         # events-table window lane
        "q_dedup_simhash",      # regex tokenize + explode + bit kernels
        "q_multimodal_features",  # Arrow/Pandas worker spin-up
    ]
    # fail LOUDLY on a basket/registry drift (r18 advice): silently
    # skipping a renamed basket query would quietly reintroduce the
    # 1.33x sweep-position bias the basket exists to kill
    missing = [name for name in warmup if name not in queries]
    assert not missing, f"warm-up basket names not in the registry: {missing}"
    for name in warmup:
        queries[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name, fn in queries.items():
        if only is not None and name not in only:
            continue
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm
        runs = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 3)
        # min/max across measured runs: lets a reader separate contention
        # noise (wide spread) from real plan regressions (tight spread at
        # a higher median) straight from the artifact
        spread[name] = [round(min(runs), 3), round(max(runs), 3)]

    total = round(sum(timings.values()), 3)
    full = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "sf": sf,
        "runs_per_query": RUNS,
    }
    # The driver captures a bounded tail of stdout: r5's single line
    # (medians + spread for 79 queries) outgrew that buffer and the
    # official artifact recorded "parsed": null. Two-part fix: the
    # stdout line carries medians only (compact, parseable), and the
    # FULL result — spread included — is written to bench_out.json
    # next to this script so it survives as a committed artifact.
    if only is None:
        out_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "bench_out.json"
        )
        with open(out_path, "w") as f:
            json.dump(full, f, indent=1)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "runs_per_query": RUNS,
                "full_results": "bench_out.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
