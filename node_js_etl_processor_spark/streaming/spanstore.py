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


def exact_twin_reps(docs: DataFrame) -> DataFrame:
    """Keep-one collapse for within-drop EXACT twins (the r17 advice
    fix for the novelty gate): one representative per exact-content
    fingerprint (min doc_id — q_dedup_docs' deterministic-keeper
    rule). Without it, two copies of never-seen content delivered in
    ONE drop cut each other — every position of each twin is
    duplicated by the other's identical digests — so NO copy of the
    content survives, and the admitted corpus depends on delivery
    batching (the same two docs split across two drops admit the
    first). Collapsing twins BEFORE scoring removes the mutual kill:
    the representative is scored with its twins' digests absent (so
    genuinely novel content survives) and the non-representatives are
    dropped as exact duplicates of an admitted doc — the keep-one
    verdict a dedup gate owes them.

    Scale: one window over the 16-byte content fingerprint, batch-
    sized (the drop, never the store)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..operators.text import fingerprint

    w_fp = Window.partitionBy(fingerprint(F.col("text")))
    return (
        docs.withColumn("_rep", F.min("doc_id").over(w_fp))
        .filter(F.col("doc_id") == F.col("_rep"))
        .drop("_rep")
    )


def novelty_gated_ingest_applier(
    store_path: str,
    out_path: str,
    checkpoint: str,
    max_dup_pct: int = 50,
    w: int = SPAN_W,
):
    """Novelty-GATED ingestion (r17): the end-to-end "score, then
    admit" loop the drop scorer exists for — per micro-batch, score
    the drop's duplication coverage against the CURRENT postings
    store (``novelty.novelty_of_drop`` — only the drop is tokenized),
    CUT every document whose duplicated-coverage share exceeds
    ``max_dup_pct`` percent (the Lee et al. 2022 §5 train-set cut,
    applied at ingest time), publish the survivors to ``out_path``
    and append ONLY the survivors' shingle postings to the store — so
    the store grows with what was admitted, and the next drop is
    scored against exactly the admitted corpus.

    The gate is pure-integer cross-multiplication
    (100·dup_extent_tokens > max_dup_pct·n_tokens cuts), so no float
    boundary can flip a verdict across engines or runs. Documents too
    short to shingle have no coverage row and are KEPT — clean by
    construction, the q_doc_novelty output contract. Feed contract:
    drops carry NEW doc_ids (the doc_id-ordered contract every ingest
    lane documents — also ``novelty_of_drop``'s scoring
    precondition).

    Within-drop EXACT twins take the keep-one rule (r17 advice): the
    drop is collapsed to one representative per exact-content
    fingerprint (``exact_twin_reps``) BEFORE scoring, so two copies
    of never-seen content no longer cut each other (which would admit
    NO copy and make the admitted corpus delivery-batching-dependent);
    the representative is scored twin-free and the other copies are
    dropped as exact duplicates of an admitted doc. NEAR-duplication
    within a drop still cuts through the gate itself, as before.

    Exactly-once: the exact_dedup_applier protocol verbatim — marker
    hit returns the batch's PUBLISHED survivors
    (``read_batch_output``); a re-delivery purges this tag's partial
    publishes FIRST (``recover_partial`` on both roots), which is
    load-bearing here: re-scoring against a store that already
    contained the crashed attempt's postings would see every drop
    position duplicated and wrongly cut the whole batch."""
    from ..operators.novelty import novelty_of_drop
    from .markers import (
        batch_already_applied,
        cleanup_staging,
        mark_batch_applied,
        marker_id,
        read_batch_output,
        recover_partial,
        stage_and_publish,
        store_has_data,
    )

    def _ingest(batch_df: DataFrame, batch_id: int):
        from pyspark.sql import functions as F

        spark = batch_df.sparkSession
        tag = marker_id(checkpoint, batch_id)
        if batch_already_applied(store_path, checkpoint, batch_id):
            cleanup_staging(store_path, tag)
            cleanup_staging(out_path, tag)
            return read_batch_output(spark, out_path, tag)
        recover_partial(store_path, tag)
        recover_partial(out_path, tag)
        # keep-one BEFORE scoring (see the docstring's twin rule)
        batch_df = exact_twin_reps(batch_df).localCheckpoint(eager=True)
        if store_has_data(store_path):
            stored = spark.read.parquet(store_path)
        else:
            # first drop bootstraps: scored against nothing, so only
            # WITHIN-drop duplication can cut
            stored = spark.createDataFrame(
                [], "doc_id long, pos bigint, h bigint"
            )
        cut = (
            novelty_of_drop(batch_df, stored, w)
            .filter(
                F.lit(100) * F.col("dup_extent_tokens")
                > F.lit(max_dup_pct) * F.col("n_tokens")
            )
            .select("doc_id")
        )
        survivors = batch_df.join(cut, "doc_id", "left_anti").localCheckpoint(
            eager=True
        )
        stage_and_publish(out_path, tag, {"": (survivors, None)})
        stage_and_publish(
            store_path, tag, {"": (shingle_positions(survivors, w), None)}
        )
        mark_batch_applied(store_path, checkpoint, batch_id)
        cleanup_staging(store_path, tag)
        cleanup_staging(out_path, tag)
        return survivors

    return _ingest


def novelty_gated_ingest_stream(
    docs_stream: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint: str,
    max_dup_pct: int = 50,
    w: int = SPAN_W,
):
    """``novelty_gated_ingest_applier`` as an availableNow stream."""
    return (
        docs_stream.writeStream.foreachBatch(
            novelty_gated_ingest_applier(
                store_path, out_path, checkpoint, max_dup_pct, w
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
