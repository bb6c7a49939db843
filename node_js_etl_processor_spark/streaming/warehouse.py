"""Streaming warehouse maintenance: the SCD2 CDC loop as a stream.

``sources/scd2_store.py`` merges one CDC batch into the stored type-2
dimension; this module runs that merge per micro-batch — the
warehouse-tier member of the foreachBatch ingest-loop family
(streaming/dedup.py's exact/near-dup/countmin loops). foreachBatch is
the right tool for the same reason as there: each batch needs a BATCH
join against an existing store plus a partition-scoped overwrite, and
the store IS the cross-batch state — unbounded-history-sized on disk,
not in executor memory, which no stateful-operator watermark could
bound (a dimension never forgets its history).

Stream == batch is test-pinned (tests/test_scd2_store.py): feeding the
fact table in date-ordered micro-batches leaves exactly the history
the one-shot ``q_scd2`` rebuild produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def scd2_cdc_stream(
    facts_stream: DataFrame,
    store_path: str,
    checkpoint: str,
    n_buckets: int = 32,
):
    """Apply an orders-shaped CDC stream to the stored dimension: the
    first batch bootstraps the store (full build — the batch is the
    whole known history at that point), every later batch merges via
    ``scd2_apply_delta`` (touched buckets only). availableNow trigger —
    the same drain-the-source twin as every ingest loop here. Returns
    the started query.

    The CDC contract is inherited: arrival order must respect the
    per-key (o_orderdate, o_orderkey) order, the standard assumption
    for a change-data feed. Re-delivered batches are no-ops
    (``streaming.markers`` — re-applying a CDC batch would mint
    phantom versions, since its first change now equals the closed
    current status but later changes would re-append), and a
    re-delivered BOOTSTRAP batch re-runs the full build as an
    overwrite (bootstrap sentinel, r10) instead of merging against
    its own rows.

    Honest residual window (merge-style loop): a crash in the MIDDLE
    of ``scd2_apply_delta``'s dynamic partition overwrite leaves some
    buckets updated and some not, and the re-delivered merge cannot
    tell which — exactly-once for partition-rewriting merges needs a
    transactional table format, unlike the append-style loops, whose
    window the staged-publish protocol closes."""
    from ..sources.scd2_store import scd2_apply_delta, write_scd2_store
    from .markers import (
        batch_already_applied,
        bootstrap_pending,
        mark_batch_applied,
        record_bootstrap,
        store_has_data,
    )

    # markers live BESIDE the store (the countmin precedent): the
    # bootstrap build overwrites store_path WHOLESALE, which would
    # wipe markers — and the bootstrap sentinel — kept inside it
    meta_path = store_path.rstrip("/") + "_meta"

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_already_applied(meta_path, checkpoint, batch_id):
            return
        if batch_df.isEmpty():
            return
        has_store = store_has_data(store_path)
        if not has_store or bootstrap_pending(meta_path, checkpoint, batch_id):
            record_bootstrap(meta_path, checkpoint, batch_id)
            write_scd2_store(batch_df, store_path, n_buckets=n_buckets)
        else:
            scd2_apply_delta(
                batch_df.sparkSession, batch_df, store_path, n_buckets=n_buckets
            )
        mark_batch_applied(meta_path, checkpoint, batch_id)

    return (
        facts_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
