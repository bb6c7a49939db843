"""Replay guards for the foreachBatch ingest loops.

foreachBatch is at-least-once: if the driver dies after a batch's
side effects commit but before the streaming checkpoint records the
batch, restart re-delivers the SAME batch_id. For loops whose side
effect is a plain append or merge (BM25 postings, ANN layout rows,
Count-Min cell addition, SCD2 version append, survivor output), a
replay silently corrupts the store — duplicated postings inflate
df sums, re-merged grids double counts, re-applied CDC batches mint
phantom dimension versions.

The guard: after a batch's writes complete, the loop creates a marker
directory ``<store>/_batches/<md5(checkpoint)[:12]>_<batch_id>``; a
re-delivered (checkpoint, batch_id) pair short-circuits to a no-op.
Underscore-prefixed paths are invisible to Spark's file index, so
markers never pollute reads, and partition-scoped overwrites
(SCD2's dynamic mode) never touch them.

Honest residual window: a crash BETWEEN a batch's first write and its
marker still replays partially-applied work — closing that needs a
staging-dir + atomic-rename ingest (or a transactional table format),
which is out of scope here and called out in each loop's docstring.
Reprocessing the same source under a NEW checkpoint is a new stream,
not a retry, and intentionally re-ingests.
"""

from __future__ import annotations

import hashlib
import os


def _marker_path(store_path: str, checkpoint: str, batch_id: int) -> str:
    sid = hashlib.md5(checkpoint.encode()).hexdigest()[:12]
    return os.path.join(store_path, "_batches", f"{sid}_{batch_id}")


def batch_already_applied(store_path: str, checkpoint: str, batch_id: int) -> bool:
    """True iff this (checkpoint, batch_id) already committed its
    side effects — the re-delivery short-circuit."""
    return os.path.isdir(_marker_path(store_path, checkpoint, batch_id))


def mark_batch_applied(store_path: str, checkpoint: str, batch_id: int) -> None:
    """Record a batch's side effects as committed (call LAST)."""
    os.makedirs(_marker_path(store_path, checkpoint, batch_id), exist_ok=True)
