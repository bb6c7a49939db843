"""Streaming deduplication with watermark-bounded state.

The streaming twin of the batch dedup family (operators/dedup.py):
incoming events may repeat (at-least-once sources, retried producers),
and the stream must emit each logical event once without keeping
unbounded seen-key state.

- ``dedup_events_stream`` — ``dropDuplicatesWithinWatermark``: state
  for a key is dropped once the watermark passes it, so memory is
  bounded by (watermark lag × event rate) while still absorbing any
  duplicate that arrives within the lag. This is the correct semantics
  for retry-induced duplicates, which arrive close to the original.
- ``dedup_exact_stream`` — plain ``dropDuplicates`` on the key for
  comparison; state grows forever (documented anti-pattern at scale,
  kept for parity with the batch exact-dedup semantics in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions.timeutil import ensure_instant


def dedup_events_stream(
    events_stream: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermark-bounded streaming dedup on ``keys`` (default:
    event_id). Input must be a streaming DataFrame with a ``ts``
    timestamp column."""
    events_stream = ensure_instant(events_stream)
    return events_stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def dedup_exact_stream(
    events_stream: DataFrame,
    keys: list[str] | None = None,
) -> DataFrame:
    """Exact streaming dedup via plain ``dropDuplicates`` on ``keys``
    (default: event_id).

    State-growth warning: without a watermark, the seen-key state grows
    without bound — every key ever observed stays in the state store
    forever. Kept for parity with batch exact-dedup semantics (absorbs
    duplicates arbitrarily far apart); at scale use
    ``dedup_events_stream``, whose state is bounded by watermark lag.
    """
    return events_stream.dropDuplicates(keys or ["event_id"])


def url_frontier_stream(
    urls_stream: DataFrame,
    url_col: str = "url",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming crawl-frontier dedup: canonicalize each discovered
    URL (``operators.text.normalize_url`` — the exact batch
    expression, so stream and batch agree bit-for-bit on the key) and
    keep the first arrival per canonical key within the watermark
    window. The input must carry a ``ts`` discovery-time column; state
    for a canonical URL is dropped once the watermark passes it —
    the right semantics for a frontier, where re-discoveries cluster
    near the first sighting (links propagate fast) and a re-crawl
    after the horizon is usually WANTED (content may have changed).

    At 100 TB-frontier scale the state is bounded by
    (watermark lag × discovery rate), and the canonical key is ~60
    bytes/URL — the batch backstop for the long tail is
    ``operators.text.q_url_dedup`` over the landing zone, the same
    ingest/compact split as the curation pipeline."""
    from pyspark.sql import functions as F

    from ..functions.timeutil import ensure_instant
    from ..operators.text import normalize_url

    canon = ensure_instant(urls_stream).withColumn(
        "canonical_url", normalize_url(F.col(url_col))
    )
    return canon.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["canonical_url"]
    )


def exact_dedup_ingest_stream(
    docs_stream: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint: str,
):
    """The ingest loop of ``sources/dedup_store.py`` as a STREAM (r8):
    per micro-batch, ``dedup_exact_delta`` drops every doc whose text
    fingerprint is already in the store (or duplicated within the
    batch — min-doc_id keeper), appends the survivors to ``out_path``
    and their fingerprints to the store. The store IS the cross-batch
    dedup state: unbounded-corpus-sized on DISK (16 bytes/doc in
    parquet), not in executor memory — the shape a plain
    ``dropDuplicates`` stream cannot reach, because exact corpus dedup
    must never forget (no watermark can bound it). foreachBatch is
    the right tool precisely because each batch needs a BATCH join
    against an existing table plus two idempotent appends.

    Returns the started query (availableNow — the same trigger twin
    as every refresh here). Batch equivalence is test-pinned: streamed
    batches == q_dedup_docs keepers when arrival order matches doc_id
    order."""
    import os

    from ..sources.dedup_store import (
        append_fingerprint_store,
        dedup_exact_delta,
        write_fingerprint_store,
    )

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not os.path.isdir(store_path):
            # first batch bootstraps the store from nothing: in-batch
            # dedup only, then the store is born from its survivors
            from pyspark.sql import functions as F
            from pyspark.sql.window import Window

            from ..operators.dedup import fingerprint

            w = Window.partitionBy("_fp").orderBy(F.col("doc_id").asc())
            survivors = (
                batch_df.withColumn("_fp", fingerprint(F.col("text")))
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_fp", "_rn")
            )
            survivors.write.mode("append").parquet(out_path)
            write_fingerprint_store(survivors, store_path)
            return
        survivors = dedup_exact_delta(spark, batch_df, store_path)
        survivors.write.mode("append").parquet(out_path)
        append_fingerprint_store(survivors, store_path)

    return (
        docs_stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
