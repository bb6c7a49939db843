"""Batch merge/upsert: latest-write-wins snapshot maintenance.

The reference never implements persistence, but its README documents
the intended load path precisely: a PostgreSQL upsert keyed on
``UNIQUE(name, state_province)`` with ``ON CONFLICT ... DO UPDATE``
(reference README.md:295-310). This module is that contract as a pure
batch operator over immutable snapshots — the idiomatic Spark shape
(rewrite-partition/merge-on-read, à la Delta/Iceberg MERGE, without
requiring a table format in this container).

Scale: one union + one window keyed on the merge key — a single
shuffle. For partitioned production tables, pair with dynamic
partition overwrite so only partitions containing updated keys
rewrite; the operator itself is format-agnostic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def upsert_snapshot(
    current: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    order_col: str,
) -> DataFrame:
    """Merge ``updates`` into ``current``: rows with a matching key are
    replaced when the update's ``order_col`` is >= the current row's
    (last-write-wins; updates break ties, matching upsert overwrite
    semantics); unmatched update rows are inserts; unmatched current
    rows survive.

    Both inputs must share a schema. Deterministic: ordering ties
    within a side are broken by preferring the updates side.
    """
    tagged = current.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(), F.col("_src").desc()
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def delete_keys(current: DataFrame, tombstones: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Anti-join deletion: drop rows whose key appears in ``tombstones``
    (the DELETE arm of a MERGE). Left-anti shuffles only the key
    columns of the tombstone side.
    """
    return current.join(tombstones.select(*keys).distinct(), list(keys), "left_anti")
