"""Bucketed tables: shuffle-free co-located joins and aggregations.

At 100 TB the single biggest join cost is shuffling both fact sides.
Hive-style bucketing fixes the partitioning ON DISK: write each table
bucketed (hash-partitioned + optionally sorted) by the join key, and
every subsequent equi-join or aggregation on that key runs with ZERO
exchanges — the scan itself satisfies the required distribution.

This is the persistent complement to `repartition()` (per-query) and
`broadcast()` (small side only). Rules of thumb:

- bucket both sides with the SAME bucket count on the SAME key;
- pick bucket count ≈ target parallelism at the expected data volume
  (buckets are the max post-scan parallelism for bucket-preserving
  plans);
- `sortBy` the bucket key to unlock sort-merge without a Sort node.

Verified in tests/test_plans.py: a join between two tables bucketed on
the key compiles with no Exchange on either side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    Bucketing only exists through the catalog (``saveAsTable``) — a
    plain parquet path write silently drops bucket metadata, which is
    why this helper takes a table name, not a path.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
