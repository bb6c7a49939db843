"""Incremental shingle-postings store (r16): the thirteenth
ingest-day tier — the ExactSubstr span family's shingling
(``operators/spans.py``) maintained incrementally. Each micro-batch
tokenizes its documents ONCE and appends their (doc_id, pos, h)
w-token shingle digests to an append-only parquet tree through the
markers protocol; duplicated-span extents are then a READ over the
stored 8-byte digests (``read_span_extents`` →
``spans.extents_from_positions``) with no re-tokenization of the
corpus — the ingest/compact split the BM25 and edge stores already
follow.

Why a positions store and not a counts store: extents are positional
(the sweep-line merge needs every duplicated position), and
duplication is RETROACTIVE — a shingle unique today becomes
duplicated when its twin arrives tomorrow, so the read path must see
all positions, not a per-batch verdict. The store row is 24 bytes
(doc_id, pos, h), strictly smaller than the text it replaces, and
the read-side duplication gate is the same one-exchange COUNT window
the batch query runs.

Exactly-once: pure append — every batch lands via
``stage_and_publish`` (batch-tagged renames), a marker hit no-ops,
and a crashed publish is purged tag-first before recompute. The
composed crash-matrix test pins streamed-store extents == the
one-shot ``q_span_extents`` over the whole corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.spans import SPAN_W, extents_from_positions, shingle_positions


def span_postings_applier(store_path: str, checkpoint: str, w: int = SPAN_W):
    """Per-batch shingle-postings append as an idempotent applier
    (see the module docstring)."""
    from .markers import (
        batch_already_applied,
        cleanup_staging,
        mark_batch_applied,
        marker_id,
        recover_partial,
        stage_and_publish,
    )

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        tag = marker_id(checkpoint, batch_id)
        if batch_already_applied(store_path, checkpoint, batch_id):
            cleanup_staging(store_path, tag)
            return None
        recover_partial(store_path, tag)
        sh = shingle_positions(batch_df, w)
        stage_and_publish(store_path, tag, {"": (sh, None)})
        mark_batch_applied(store_path, checkpoint, batch_id)
        cleanup_staging(store_path, tag)
        return None

    return _ingest


def span_postings_ingest_stream(
    docs_stream: DataFrame, store_path: str, checkpoint: str, w: int = SPAN_W
):
    """``span_postings_applier`` as an availableNow stream."""
    return (
        docs_stream.writeStream.foreachBatch(
            span_postings_applier(store_path, checkpoint, w)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_span_extents(
    spark: SparkSession, store_path: str, w: int = SPAN_W
) -> DataFrame:
    """Duplicated-span extents over the WHOLE ingested corpus, from
    the stored digests — ``extents_from_positions`` over the postings
    tree, no re-tokenization. ``w`` must match the ingest width (the
    digests are w-specific)."""
    return extents_from_positions(spark.read.parquet(store_path), w)


def read_doc_novelty(
    spark: SparkSession, store_path: str, w: int = SPAN_W
) -> DataFrame:
    """Per-document duplication-coverage scores over the WHOLE
    ingested corpus from the stored digests (r17 — the verdict's
    store-read ask): ``novelty_from_positions`` over the postings
    tree. Totals here are a plain parquet re-read (per-doc posting
    counts), so nothing is ever re-tokenized; equality with the
    batch ``q_doc_novelty`` over the union corpus is test-pinned."""
    from ..operators.novelty import novelty_from_positions

    return novelty_from_positions(spark.read.parquet(store_path), w)


def score_drop_novelty(
    spark: SparkSession,
    store_path: str,
    drop_docs: DataFrame,
    w: int = SPAN_W,
) -> DataFrame:
    """Score a NEW drop's novelty against the stored corpus BEFORE
    admitting it (r17): only the drop is tokenized; the store is
    touched by one broadcast-semi-filtered counting pass (see
    ``novelty.novelty_of_drop``). Equals
    ``q_doc_novelty(corpus ∪ drop)`` restricted to the drop's
    doc_ids — the per-document cut signal a curation gate acts on at
    ingest time, kmv_difference-style."""
    from ..operators.novelty import novelty_of_drop

    return novelty_of_drop(drop_docs, spark.read.parquet(store_path), w)
