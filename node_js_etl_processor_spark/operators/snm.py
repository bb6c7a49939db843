"""Sorted-neighborhood dedup blocking — DECLARED in r16
(built + pytest-oracle-verified in r15): the classic entity-resolution blocking method
(Hernández & Stolfo, SIGMOD 1995, "The Merge/Purge Problem for Large
Databases"): sort the corpus by a fuzzy key, slide a fixed window of
w over the sorted order, and verify only window-local pairs — the
THIRD blocking strategy in the dedup family, complementing the
deletion-neighborhood generator (FastSS, ``dedup.q_fuzzy_match``)
and the signature blockers (minhash/simhash): SNM trades recall
guarantees for a hard candidate budget of n·w pairs, the right deal
when the sort key clusters true duplicates.

Verification is exact Levenshtein ≤ max_dist on the normalized key.
Edit-distance UNITS differ across engines on non-ASCII text — Spark
counts code-point edits, DuckDB counts BYTE edits (verified: 'café'
vs 'cafe' is 1 vs 2) — so the operator restricts itself to ASCII
keys EXPLICITLY, with the same predicate in both engines
(char length == byte length: Spark length = octet_length, DuckDB
length = strlen). Within that domain the distances are identical
integers (spot-pinned in tests), every emitted column is exact, and
the DuckDB oracle (a global ROW_NUMBER + self-join on rank distance
— deliberately the single-machine formulation) compares bit-for-bit.
A non-ASCII corpus needs a transliteration pass first; silently
mixing edit-distance units would be worse than refusing.

Scale shape — the distributed GLOBAL RANKING pattern: a global
``row_number() OVER (ORDER BY …)`` is a one-task plan, so the rank
is computed instead as range-repartition → per-partition local
row_number → plus broadcast per-partition offsets (a ≤#partitions
row frame; its own ordering window is single-partition over ~32
rows, not the corpus). Ranks are boundary-independent: the global
(key, id) order is total, so wherever the range partitioner cuts,
local-rank + offset reproduces exactly the global position.
Neighbor pairs then come from an EQUI-join on rank (each row
explodes its w successor ranks), never a windowed self-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: sliding window width (candidate pairs per row after sorting)
SNM_WINDOW = 5

#: verification threshold: unit-cost edit distance on the sort key
SNM_MAX_DIST = 2

#: range-partition fan-out for the distributed ranking
_RANK_PARTS = 32


def global_rank(df: DataFrame, sort_cols: "list[str]") -> DataFrame:
    """Add ``rn`` = the row's 1-based position in the total
    (sort_cols) order, without a single-partition window over the
    corpus: range-repartition on the sort columns, rank locally per
    partition, and add broadcast cumulative offsets. The sort order
    must be total (include a tiebreaker column) for the rank to be
    deterministic."""
    ranked = df.repartitionByRange(_RANK_PARTS, *sort_cols)
    with_pid = ranked.withColumn("pid", F.spark_partition_id())
    w_local = Window.partitionBy("pid").orderBy(*sort_cols)
    local = with_pid.withColumn("lrn", F.row_number().over(w_local))
    counts = local.groupBy("pid").agg(F.count("*").alias("n"))
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "off", F.coalesce(F.sum("n").over(w_off), F.lit(0))
    ).select("pid", "off")
    return (
        local.join(F.broadcast(offsets), "pid")
        .withColumn("rn", (F.col("lrn") + F.col("off")).cast("long"))
        .drop("pid", "lrn", "off")
    )


def q_snm_pairs(
    customer: DataFrame,
    window: int = SNM_WINDOW,
    max_dist: int = SNM_MAX_DIST,
) -> DataFrame:
    """Declared query (r16): sorted-neighborhood candidate pairs
    over customer names — rows (custkey_a, custkey_b, dist) for every
    pair within ``window`` positions of each other in the
    (lower(trim(c_name)), c_custkey) order whose normalized keys are
    within ``max_dist`` edits. custkey_a precedes custkey_b in the
    sort order, so each pair is emitted exactly once."""
    if window < 1:
        raise ValueError("q_snm_pairs needs window >= 1 (F.sequence"
                         " auto-decrements when start > stop, which"
                         " would emit self-pairs)")
    keyed = customer.select(
        "c_custkey", F.lower(F.trim(F.col("c_name"))).alias("k")
    ).filter(F.length("k") == F.octet_length("k"))  # ASCII-only domain
    s = global_rank(keyed, ["k", "c_custkey"])
    a = s.select(
        F.col("c_custkey").alias("custkey_a"),
        F.col("k").alias("ka"),
        F.explode(
            F.sequence(F.col("rn") + 1, F.col("rn") + window)
        ).alias("rn"),
    )
    b = s.select(
        F.col("c_custkey").alias("custkey_b"),
        F.col("k").alias("kb"),
        "rn",
    )
    return (
        a.join(b, "rn")
        .withColumn("dist", F.levenshtein("ka", "kb").cast("long"))
        .filter(F.col("dist") <= max_dist)
        .select("custkey_a", "custkey_b", "dist")
    )


#: the DuckDB twin, registry-wired in r16 — the
#: deliberately single-machine formulation (one global ROW_NUMBER +
#: a rank-distance self-join), cross-checking the distributed
#: rank+offset rewrite. Window and distance thresholds interpolate
#: SNM_WINDOW / SNM_MAX_DIST (r16 advice item) so the oracle can
#: never drift from the engine defaults.
SNM_PAIRS_ORACLE = f"""
    WITH keyed AS (
      SELECT c_custkey, lower(trim(c_name)) AS k
      FROM customer
      WHERE length(lower(trim(c_name))) = strlen(lower(trim(c_name)))
    ), s AS (
      SELECT c_custkey, k,
             row_number() OVER (ORDER BY k, c_custkey) AS rn
      FROM keyed
    )
    SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
           CAST(levenshtein(a.k, b.k) AS BIGINT) AS dist
    FROM s a JOIN s b ON b.rn BETWEEN a.rn + 1 AND a.rn + {SNM_WINDOW}
    WHERE levenshtein(a.k, b.k) <= {SNM_MAX_DIST}
"""
