"""Streaming index maintenance: the BM25 ingest loop.

``sources/bm25_index.py`` made the lexical index incrementally
maintainable (df/stats as mergeable partials); this module closes the
family the same way the dedup stores and the SCD2 dimension were
closed — the per-micro-batch foreachBatch loop. Because an append is
three O(|batch|) writes that never read the store, the stream twin is
trivially idempotent-per-batch and needs no cross-batch executor
state: the index on disk IS the state.

Stream == batch is test-pinned (tests/test_bm25_index.py): a corpus
landed as three drops scores identically to the one-shot index.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def bm25_index_stream(
    docs_stream: DataFrame,
    index_path: str,
    checkpoint: str,
):
    """Maintain a BM25 postings index from a document stream: the
    first batch bootstraps the layout, every later batch appends its
    postings + df/stats partials. availableNow trigger — the same
    drain-the-source twin as every ingest loop here. Returns the
    started query. Upstream must feed docs whose doc_ids are new to
    the index (the dedup ingest loops' output contract)."""
    from ..sources.bm25_index import append_bm25_index, write_bm25_index

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if not os.path.isdir(index_path):
            write_bm25_index(batch_df, index_path)
            return
        append_bm25_index(batch_df, index_path)

    return (
        docs_stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
