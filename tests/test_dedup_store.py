"""Incremental MinHash dedup: the signature store + delta probe must
agree with the full-corpus self-join, hash only the new batch, and
broadcast the drop side."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from node_js_etl_processor_spark.catalog import load_table
from node_js_etl_processor_spark.operators.dedup import minhash_candidates
from node_js_etl_processor_spark.sources.dedup_store import (
    append_minhash_store,
    dedup_minhash_delta,
    write_minhash_store,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_delta_equals_full_corpus_candidates(spark, sf_dir, tmp_path):
    """delta(new | store(old)) must produce EXACTLY the full-corpus
    candidate pairs that touch the new batch — same hash family, same
    banding, so batch and incremental dedup can never disagree."""
    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    path = str(tmp_path / "mh_store")
    write_minhash_store(old, path)

    got = {
        (min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]))
        for r in dedup_minhash_delta(spark, new, path).collect()
    }
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    full = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_candidates(docs).collect()
        if r["doc_a"] in new_ids or r["doc_b"] in new_ids
    }
    assert got == full and len(got) > 0


def test_delta_never_reads_old_text_and_broadcasts_drop(spark, sf_dir, tmp_path):
    """Scale contract: the store side reads only (bucket, doc_id [+
    band from directories]) — the accepted corpus's text column never
    appears in any ReadSchema of the store scan — and the join against
    the store is a BroadcastHashJoin with the NEW side as the build
    side."""
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "mh_store")
    write_minhash_store(docs.filter(F.col("doc_id") % 5 != 0), path)
    new = docs.filter(F.col("doc_id") % 5 == 0)

    plan = _plan(dedup_minhash_delta(spark, new, path))
    store_scans = [
        seg.split("\n")[0]
        for seg in plan.split("ReadSchema:")[1:]
        if "bucket" in seg.split("\n")[0]
    ]
    assert store_scans and all("text" not in s for s in store_scans)
    assert "BroadcastHashJoin" in plan


def test_append_closes_the_ingest_loop(spark, sf_dir, tmp_path):
    """After appending the accepted batch, the next delta sees it:
    probing the SAME batch again yields its pairs as new-old hits."""
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "mh_store")
    batch1 = docs.filter(F.col("doc_id") < 100)
    batch2 = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 200))
    write_minhash_store(batch1, path)
    append_minhash_store(batch2, path)

    # re-probing batch2 now collides with its own stored postings
    probe = dedup_minhash_delta(spark, batch2.limit(5), path)
    types = {r["pair_type"] for r in probe.collect()}
    # every stored doc collides with itself via identical buckets —
    # but self-pairs are filtered, so only true cross-doc pairs remain
    assert types <= {"new-old", "new-new"}
    n_store_bands = spark.read.parquet(path).select("band").distinct().count()
    assert n_store_bands == 8


def test_exact_delta_store_roundtrip(spark, sf_dir, tmp_path):
    """Exact incremental dedup: docs whose text is already stored are
    dropped, in-batch duplicates keep min doc_id, survivors' schema is
    the input schema, and after appending survivors a re-probe of the
    same batch drops everything."""
    from node_js_etl_processor_spark.sources.dedup_store import (
        append_fingerprint_store,
        dedup_exact_delta,
        write_fingerprint_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    path = str(tmp_path / "fp_store")
    write_fingerprint_store(old, path)

    survivors = dedup_exact_delta(spark, new, path)
    assert survivors.columns == docs.columns

    # reference: full-corpus exact dedup keepers that are new-batch docs
    # AND not text-duplicates of any old doc
    from node_js_etl_processor_spark.operators.dedup import fingerprint

    old_fps = {r["fp"] for r in old.select(fingerprint(F.col("text")).alias("fp")).collect()}
    by_fp = {}
    for r in new.select("doc_id", fingerprint(F.col("text")).alias("fp")).collect():
        if r["fp"] not in old_fps:
            by_fp.setdefault(r["fp"], []).append(r["doc_id"])
    want = {min(v) for v in by_fp.values()}
    got = {r["doc_id"] for r in survivors.collect()}
    assert got == want and len(got) > 0

    append_fingerprint_store(survivors, path)
    assert dedup_exact_delta(spark, new, path).count() == 0


def test_simhash_delta_equals_full_corpus_pairs(spark, sf_dir, tmp_path):
    """r8: the simhash band store's delta probe must produce EXACTLY
    the batch form's verified pairs that touch the new batch — same
    numpy signature kernel, same 4x16-bit banding, same Hamming
    verify, so batch and incremental near-dup can never disagree."""
    from node_js_etl_processor_spark.operators.dedup import simhash_pairs
    from node_js_etl_processor_spark.sources.dedup_store import (
        dedup_simhash_delta,
        write_simhash_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    path = str(tmp_path / "sh_store")
    write_simhash_store(old, path)

    got = {
        (min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]), r["hamming"])
        for r in dedup_simhash_delta(spark, new, path).collect()
    }
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    full = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_pairs(docs, portable=False).collect()
        if r["doc_a"] in new_ids or r["doc_b"] in new_ids
    }
    assert got == full and len(got) > 0


def test_simhash_delta_never_reads_old_text_and_broadcasts_drop(
    spark, sf_dir, tmp_path
):
    """Scale contract, simhash twin: the store scan reads only
    (chunk, doc_id, sig [+ band from directories]) — never text — and
    the store join builds on the broadcast NEW side."""
    from node_js_etl_processor_spark.sources.dedup_store import (
        dedup_simhash_delta,
        write_simhash_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "sh_store")
    write_simhash_store(docs.filter(F.col("doc_id") % 5 != 0), path)
    new = docs.filter(F.col("doc_id") % 5 == 0)

    plan = _plan(dedup_simhash_delta(spark, new, path))
    store_scans = [
        seg.split("\n")[0]
        for seg in plan.split("ReadSchema:")[1:]
        if "chunk" in seg.split("\n")[0]
    ]
    assert store_scans and all("text" not in s for s in store_scans)
    assert "BroadcastHashJoin" in plan


def test_simhash_append_closes_the_ingest_loop(spark, sf_dir, tmp_path):
    """After appending a batch, re-probing it yields its own pairs as
    new-old hits; the store keeps its 4-band layout."""
    from node_js_etl_processor_spark.sources.dedup_store import (
        append_simhash_store,
        dedup_simhash_delta,
        write_simhash_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "sh_store")
    batch1 = docs.filter(F.col("doc_id") < 100)
    batch2 = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 200))
    write_simhash_store(batch1, path)
    append_simhash_store(batch2, path)

    probe = dedup_simhash_delta(spark, batch2.limit(5), path)
    rows = probe.collect()
    assert {r["pair_type"] for r in rows} <= {"new-old", "new-new"}
    assert all(r["hamming"] <= 3 for r in rows)
    n_store_bands = spark.read.parquet(path).select("band").distinct().count()
    assert n_store_bands == 4
