"""Misra-Gries heavy hitters (r13): exact top-k by frequency without
a full-key-space shuffle — per-partition constant-memory summaries
(Misra & Gries 1982; mergeability per Agarwal et al., "Mergeable
Summaries", PODS 2012), a parameter-sized merge, a broadcast-filtered
exact recount, and a per-run guarantee validation with an exact
fallback. Lives in its own module so the rotation checker
(scripts/check_rotation.py) scopes its changes to this family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

#: Misra-Gries summary capacity per partition. The merged-summary
#: guarantee: any key with true frequency > N/(MG_CAPACITY+1) survives
#: in the merged candidate set, so the exact-verify pass only has to
#: recount a parameter-sized candidate list. 2048 keeps the guarantee
#: threshold at N/2049 — far below any top-10 boundary count in the
#: fixtures at every SF (the validation check below proves it per run
#: instead of assuming it).
MG_CAPACITY = 2048


def mg_partials(df: DataFrame, key_col: str, capacity: int = MG_CAPACITY) -> DataFrame:
    """Per-PARTITION Misra-Gries summaries (Misra & Gries 1982; the
    merge form of Agarwal et al. 2013): one O(capacity) dict per
    partition, streamed over that partition's Arrow batches inside a
    single mapInPandas call — no shuffle, no per-key state beyond the
    capacity. Emits ≤ capacity (key, mg_count) rows per partition;
    mg_count underestimates the true in-partition count by at most
    (partition_rows / (capacity+1)), and summing partials keeps both
    the underestimate property and the bound (errors add, giving the
    global N/(capacity+1) bound the candidate guarantee needs)."""
    import pandas as pd

    from ..catalog import spread

    schema = StructType(
        [
            StructField("key", LongType(), False),
            StructField("mg_count", LongType(), False),
        ]
    )

    def run(batches):
        counts: dict = {}
        for pdf in batches:
            for key in pdf[key_col]:
                key = int(key)
                if key in counts:
                    counts[key] += 1
                elif len(counts) < capacity:
                    counts[key] = 1
                else:
                    # decrement-all step: drop every zeroed counter
                    dead = []
                    for k2 in counts:
                        counts[k2] -= 1
                        if counts[k2] == 0:
                            dead.append(k2)
                    for k2 in dead:
                        del counts[k2]
        yield pd.DataFrame(
            {"key": list(counts.keys()), "mg_count": list(counts.values())}
        )

    return spread(df).select(F.col(key_col).cast("long").alias(key_col)).mapInPandas(
        run, schema
    )


def heavy_hitters_topk(
    df: DataFrame, key_col: str, k: int = 10, capacity: int = MG_CAPACITY
) -> DataFrame:
    """EXACT top-k heavy hitters without a full-key-space shuffle:

    1. Misra-Gries partials per partition (zero shuffles),
    2. merge: groupBy key over the ≤ capacity·partitions partial rows,
    3. exact verify: broadcast-semi-join the base table on the
       candidate keys and recount exactly (the full-data groupBy now
       runs over candidate rows only),
    4. validate the guarantee per run: the k-th exact candidate count
       must exceed N/(capacity+1) — the max count a key absent from
       the merged summary can have. If the data is so flat the check
       fails, fall back to the exact full groupBy (correct at any
       skew; the sketch path is the fast path, never the truth).

    The result is deterministic exact top-k ordered by (count DESC,
    key ASC), so a SQL oracle is the plain GROUP BY / ORDER BY / LIMIT
    — the sketch is an execution strategy, not a semantics change.

    Scale: step 2 shuffles ≤ capacity·partitions rows (parameter-
    sized), step 3's recount scans with a pushed broadcast filter.
    The two driver-side scalars (N, k-th candidate count) are the
    validation's only collect."""
    spark = df.sparkSession
    n_total = df.count()
    merged = (
        mg_partials(df, key_col, capacity)
        .groupBy("key")
        .agg(F.sum("mg_count").cast("bigint").alias("mg_count"))
    )
    cand_keys = merged.select("key")
    exact = (
        df.join(
            F.broadcast(cand_keys.withColumnRenamed("key", key_col)), key_col
        )
        .groupBy(key_col)
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col(key_col).asc())
        .limit(k)
    )
    rows = exact.collect()  # ≤ k rows — the presentation set itself
    threshold = n_total // (capacity + 1)
    if len(rows) < k or rows[-1]["cnt"] <= threshold:
        # guarantee not provable for this (data, capacity) — either
        # the k-th candidate count sits at/below the missed-key bound
        # or fewer than k candidates survived: recount everything
        # exactly — same result contract, full shuffle
        exact = (
            df.groupBy(key_col)
            .agg(F.count("*").cast("bigint").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col(key_col).asc())
            .limit(k)
        )
        rows = exact.collect()
    return spark.createDataFrame(
        [(int(r[key_col]), int(r["cnt"])) for r in rows],
        f"{key_col} bigint, cnt bigint",
    )


def q_heavy_hitters(orders: DataFrame) -> DataFrame:
    """Declared query (r13): exact top-10 customers by order count via
    the Misra-Gries candidate path (per-partition O(capacity)
    summaries → parameter-sized merge → broadcast-filtered exact
    recount → per-run guarantee validation with an exact-groupBy
    fallback). The DuckDB oracle is the plain GROUP BY/ORDER BY/LIMIT
    — the sketch must be invisible in the result, which is exactly
    what makes it oracle-able."""
    return heavy_hitters_topk(orders, "o_custkey", k=10)
