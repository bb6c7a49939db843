"""Streaming index maintenance: the BM25 ingest loop.

``sources/bm25_index.py`` made the lexical index incrementally
maintainable (df/stats as mergeable partials); this module closes the
family the same way the dedup stores and the SCD2 dimension were
closed — the per-micro-batch foreachBatch loop. An append is three
O(|batch|) writes that never read the store, and no cross-batch
executor state exists: the index on disk IS the state.

Replay safety: an append is NOT idempotent (re-delivering a batch
would duplicate postings and inflate the df/stats sums), so the loop
carries the ``streaming.markers`` guard — a re-delivered
(checkpoint, batch_id) pair is a no-op; the residual
crash-mid-append window is documented there.

Stream == batch is test-pinned (tests/test_bm25_index.py): a corpus
landed as three drops scores identically to the one-shot index, and
a replayed batch leaves the index untouched.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from .markers import batch_already_applied, mark_batch_applied


def bm25_index_stream(
    docs_stream: DataFrame,
    index_path: str,
    checkpoint: str,
):
    """Maintain a BM25 postings index from a document stream: the
    first batch bootstraps the layout, every later batch appends its
    postings + df/stats partials; re-delivered batches are no-ops
    (markers guard). availableNow trigger — the same drain-the-source
    twin as every ingest loop here. Returns the started query.
    Upstream must feed docs whose doc_ids are new to the index (the
    dedup ingest loops' output contract)."""
    from ..sources.bm25_index import append_bm25_index, write_bm25_index

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_already_applied(index_path, checkpoint, batch_id):
            return
        if batch_df.isEmpty():
            return
        if not os.path.isdir(f"{index_path}/postings"):
            write_bm25_index(batch_df, index_path)
        else:
            append_bm25_index(batch_df, index_path)
        mark_batch_applied(index_path, checkpoint, batch_id)

    return (
        docs_stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
