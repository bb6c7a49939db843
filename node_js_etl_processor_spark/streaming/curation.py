"""Streaming twin of the curation capstone's stateless prefix.

A crawl drop usually arrives incrementally; the quality gates and the
chunk explode are row-local (stateless), so they run IDENTICALLY on a
stream — same expressions, same plan shape, micro-batch by
micro-batch. What does NOT stream here, by design:

- exact chunk dedup needs global fingerprint uniqueness — unbounded
  keyed state with no event-time bound on this table (documents carry
  no timestamp). The batch capstone (`operators.text.
  q_curation_pipeline`) owns it; with a timestamped feed,
  ``streaming.dedup.dedup_events_stream`` is the watermark-bounded
  form.
- sequence packing needs a running token total in arrival order —
  cross-batch state whose output would depend on micro-batch
  boundaries. Packing is a per-training-run batch step over the
  accumulated keep-set, not a property of single documents.

So the streaming pipeline is gate → chunk → append-only sink (the
landing zone the batch dedup+pack capstone then compacts) — the
standard incremental-ingest / batch-compact split.

The batch-equivalence test (tests/test_streaming.py) pins stream
output == batch output of the same prefix on the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import chunk_documents, curation_compact, curation_keep


def curation_chunk_stream(documents_stream: DataFrame) -> DataFrame:
    """Quality-gate (Gopher ∧ C4 ∧ classifier — the capstone's exact
    ``curation_keep`` expression) + 64/16 token chunking over a
    STREAMING documents frame; emits (doc_id, chunk_id, n_tokens,
    chunk_text, chunk_fp) append-only rows ready for the landing zone.

    The gate runs before the chunk explode, same as the batch plan —
    a failing document is never chunked in either path.
    """
    kept = documents_stream.filter(
        curation_keep(F.col("text"), F.col("lang"))
    ).select("doc_id", "text")
    chunks = chunk_documents(kept)
    return chunks.withColumn("chunk_fp", F.md5(F.col("chunk_text")))


def compact_landing_zone(spark: SparkSession, path: str) -> DataFrame:
    """The batch-compact half of the incremental-ingest split: run the
    capstone's dedup+pack suffix (``operators.text.curation_compact``
    — the same code object the batch capstone composes) over the
    chunk landing zone ``curation_chunk_stream`` appended to.

    ``stream N docs → compact`` equals ``q_curation_pipeline`` on the
    same N docs: the streaming prefix is the capstone's stateless
    prefix verbatim, and this suffix is shared — so the only possible
    divergence is rows lost/duplicated by the sink itself, which the
    equality test would surface (exactly-once parquet append is the
    checkpointed default).

    Scale note: the landing zone accumulates crawl drops append-only;
    compaction reads ONLY (doc_id, chunk_id, n_tokens, chunk_fp) —
    column pruning keeps chunk_text, the dominant bytes, out of the
    dedup shuffle entirely."""
    return curation_compact(spark.read.parquet(path))
