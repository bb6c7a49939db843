"""Incremental SCD Type-2 dimension store: CDC merge without rebuild.

``operators.relational.q_scd2`` builds a type-2 history from the FULL
fact table — correct for a one-shot backfill, but the production
warehouse shape is a stored dimension receiving CDC DROPS: a change
batch must close the affected current rows and append new versions
WITHOUT rereading (or rewriting) the rest of the history. This is the
dedup-store pattern (sources/dedup_store.py) applied to the warehouse
tier, and the same upsert intent as the reference's own design notes
(reference README.md:295-310 — incremental upsert into the serving
store rather than full reload):

- ``write_scd2_store`` materializes the q_scd2 history Hive-partitioned
  by ``bucket = pmod(xxhash64(custkey), n_buckets)``;
- ``scd2_apply_delta`` merges a CDC batch: the batch's key set prunes
  the store read to the touched buckets (a PARTITION FILTER — untouched
  buckets are never listed, read, or rewritten), current rows of
  touched keys are closed, new versions appended, and ONLY the touched
  bucket directories are replaced (dynamic partition overwrite);
- ``scd2_cdc_stream`` (streaming/warehouse.py) is the foreachBatch twin.

CDC contract (the standard type-2 one): every batch event is strictly
later — by (o_orderdate, o_orderkey) — than every stored event of the
same key. Under it, delta == full rebuild is test-pinned
(tests/test_scd2_store.py).

Cost at 100 TB: per CDC batch, O(|batch|) window work + one read of
|touched buckets| ≈ |history| × min(1, |batch keys| / n_buckets) — vs
the full rebuild's window over every fact ever. The driver round-trip
is the ≤ n_buckets-value bucket list (parameters, not data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from node_js_etl_processor_spark.operators.relational import q_scd2

HISTORY_COLS = ["custkey", "version", "status", "valid_from", "valid_to", "is_current"]


def _bucket(col: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(col)), F.lit(n_buckets)).cast("int")


def write_scd2_store(
    orders: DataFrame, path: str, n_buckets: int = 32
) -> None:
    """Materialize the type-2 history of a fact table under ``path``,
    partitioned by key bucket. ``repartition("bucket")`` before
    ``partitionBy`` keeps one file per bucket directory per shuffle
    partition (the similarity_layout small-file discipline)."""
    hist = q_scd2(orders).withColumn("bucket", _bucket("custkey", n_buckets))
    hist.repartition("bucket").write.mode("overwrite").partitionBy("bucket").parquet(
        path
    )


def read_scd2_store(spark: SparkSession, path: str) -> DataFrame:
    """The stored history in q_scd2's exact column shape (bucket is a
    storage detail, not part of the dimension)."""
    return spark.read.parquet(path).select(*HISTORY_COLS)


def scd2_apply_delta(
    spark: SparkSession,
    cdc_batch: DataFrame,
    path: str,
    n_buckets: int = 32,
) -> None:
    """Merge a CDC batch (orders-shaped fact rows, all strictly later
    than stored events for their keys) into the stored dimension:

    1. the batch is change-compressed alone (the q_scd2 lag window,
       batch-sized);
    2. the store read is pruned to the touched buckets (partition
       filter from the batch's ≤ n_buckets bucket values) and the
       touched KEYS' current rows join the batch (batch side the
       small build side);
    3. a leading batch change equal to the key's current status is a
       non-change across the boundary and is dropped — exactly what
       the full rebuild's lag compare would do;
    4. new versions continue the stored numbering (v_max + n), the
       closed current row's valid_to = the first new change's
       valid_from, and only the touched bucket directories are
       rewritten (dynamic partition overwrite) — history outside them
       is never read or written.

    Keys absent from the store bootstrap at version 1, so the same
    call ingests brand-new dimension members.
    """
    batch = cdc_batch.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderdate").cast("date").alias("event_date"),
        F.col("o_orderstatus").alias("status"),
    )

    # ≤ n_buckets values: a parameter-sized driver round-trip that
    # becomes the store scan's partition filter
    touched_buckets = [
        r["bucket"]
        for r in batch.select(_bucket("custkey", n_buckets).alias("bucket"))
        .distinct()
        .collect()
    ]
    stored = spark.read.parquet(path).filter(F.col("bucket").isin(touched_buckets))
    keys = batch.select("custkey").distinct()
    touched = stored.join(F.broadcast(keys), "custkey", "left_semi")
    bystanders = stored.join(F.broadcast(keys), "custkey", "left_anti")

    cur = touched.filter(F.col("is_current")).select(
        "custkey",
        F.col("version").alias("_v_cur"),
        F.col("status").alias("_s_cur"),
    )

    w = Window.partitionBy("custkey").orderBy(
        F.col("event_date").asc(), F.col("orderkey").asc()
    )
    changes = (
        batch.withColumn("_prev", F.lag("status").over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col("status")))
        .withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(cur), "custkey", "left")
        # boundary no-change: the first compressed batch change can
        # equal the stored current status (explicit null guard — a
        # brand-new key has no current status and must keep its row)
        .filter(
            (F.col("_rn") != 1)
            | F.col("_s_cur").isNull()
            | (F.col("status") != F.col("_s_cur"))
        )
    )
    new_rows = changes.select(
        "custkey",
        (
            F.coalesce(F.col("_v_cur"), F.lit(0))
            + F.row_number().over(w)
        )
        .cast("bigint")
        .alias("version"),
        "status",
        F.col("event_date").alias("valid_from"),
        F.lead("event_date").over(w).alias("valid_to"),
        F.lead("event_date").over(w).isNull().alias("is_current"),
    )

    first_new = new_rows.groupBy("custkey").agg(
        F.min("valid_from").alias("_new_from")
    )
    closed_or_kept = (
        touched.filter(F.col("is_current"))
        .select(*HISTORY_COLS)
        .join(F.broadcast(first_new), "custkey", "left")
        .select(
            "custkey",
            "version",
            "status",
            "valid_from",
            F.coalesce("valid_to", F.col("_new_from")).alias("valid_to"),
            (F.col("is_current") & F.col("_new_from").isNull()).alias("is_current"),
        )
    )
    merged = (
        touched.filter(~F.col("is_current"))
        .select(*HISTORY_COLS)
        .unionByName(closed_or_kept)
        .unionByName(new_rows)
        .unionByName(bystanders.select(*HISTORY_COLS))
        .withColumn("bucket", _bucket("custkey", n_buckets))
        # materialize BEFORE the write: the plan reads the same path
        # the dynamic overwrite replaces. Touched-bucket-sized by
        # construction (|history| x |batch keys| / n_buckets), the
        # same localCheckpoint discipline as connected_components.
        .localCheckpoint(eager=True)
    )
    # dynamic overwrite: only the touched bucket directories change
    (
        merged.repartition("bucket")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(path)
    )
