"""Skew mitigation: salted joins for hot keys.

AQE's skew-join handling (on by default in session.py) splits
oversized SHUFFLE partitions automatically, which covers sort-merge
joins. Salting is the complementary manual tool for the cases AQE
can't fix — e.g., a broadcast-ineligible dimension with a handful of
hot keys, or aggregations where one key dominates.

``salted_join``: the fact side gets a deterministic salt derived from
a high-cardinality column (never rand() — reproducibility), spreading
each hot key over ``n_salts`` shuffle partitions; the dimension side
is exploded ×n_salts so every (key, salt) bucket finds its match.
Cost: dimension inflated n_salts× (fine — it's the small side);
benefit: per-task input for the hottest key drops n_salts×.

``salted_count``: two-phase aggregation — count by (key, salt) then
re-aggregate by key — the same trick for skewed groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(entropy: Column, n_salts: int) -> Column:
    return F.pmod(F.xxhash64(entropy), F.lit(n_salts)).cast("int")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    entropy_col: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `fact ⋈ dim` on ``key`` with the fact side salted by a
    deterministic hash of ``entropy_col``. Result is identical to the
    unsalted join (asserted in tests), but hot-key rows spread over
    ``n_salts`` tasks.

    Only ``inner`` and ``left`` joins are supported: in a right/full
    join an unmatched dim row would survive once per salt replica
    (n_salts duplicates), which is NOT the unsalted result. For those,
    salt the dim side's probe instead or fall back to AQE skew
    handling.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: outer "
            "joins on the exploded dim side would duplicate unmatched dim "
            f"rows {n_salts}x"
        )
    salted_fact = fact.withColumn("_salt", _salt(F.col(entropy_col), n_salts))
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_fact.join(salted_dim, [key, "_salt"], how).drop("_salt")


def salted_count(df: DataFrame, key: str, entropy_col: str, n_salts: int = 8) -> DataFrame:
    """Skew-resistant count per key: partial count by (key, salt), then
    final re-aggregation by key. Equivalent to ``groupBy(key).count()``
    with the hot key's partial aggregation spread over n_salts tasks.
    (Spark's map-side partial aggregation already gives this for simple
    counts; the pattern matters for high-cardinality aggregation
    buffers — collect_set, percentile — where map-side combine is weak.)
    """
    return (
        df.withColumn("_salt", _salt(F.col(entropy_col), n_salts))
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_partial"))
        .groupBy(key)
        .agg(F.sum("_partial").cast("bigint").alias("n"))
    )
