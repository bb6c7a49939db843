#!/usr/bin/env python
"""Benchmark harness: times every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is forced with the noop sink (df.write.format("noop")) so
timings measure the full distributed plan — scan, shuffle, agg — and
not Python row-transfer via collect(). Queries whose semantics are a
driver-side result (top-k limits) still run their full plan under noop.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from node_js_etl_processor_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    m = re.search(r"sf([\d.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None

    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()  # warm: JIT + file listing
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
