"""BM25 postings index: stored-form scoring must equal the on-the-fly
ranker, prune the scan to the query terms' buckets, and never read
text."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from node_js_etl_processor_spark.catalog import load_table
from node_js_etl_processor_spark.operators.text import BM25_QUERY_TERMS, bm25_scores
from node_js_etl_processor_spark.sources.bm25_index import (
    N_TERM_BUCKETS,
    bm25_from_index,
    write_bm25_index,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_index_scores_equal_on_the_fly(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "bm25")
    write_bm25_index(docs, path)

    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_from_index(spark, path, BM25_QUERY_TERMS).collect()
    }
    want = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(docs, BM25_QUERY_TERMS).collect()
    }
    assert got == want and len(got) > 0

    # a different term set works off the same index
    got2 = bm25_from_index(spark, path, ("the", "data")).count()
    want2 = bm25_scores(docs, ("the", "data")).count()
    assert got2 == want2


def test_index_probe_prunes_and_reads_no_text(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "bm25")
    write_bm25_index(docs, path)

    df = bm25_from_index(spark, path, BM25_QUERY_TERMS)
    plan = _plan(df)
    # bucket pruning reaches the postings scan as a PartitionFilters
    # entry, and no scan in the plan reads a text column
    pf_segments = [seg.split("\n")[0] for seg in plan.split("PartitionFilters:")[1:]]
    assert any("term_bucket" in seg for seg in pf_segments)
    for seg in plan.split("ReadSchema:")[1:]:
        assert "text" not in seg.split("\n")[0]

    # the layout fans out to at most N_TERM_BUCKETS directories
    import glob

    dirs = glob.glob(f"{path}/postings/term_bucket=*")
    assert 1 < len(dirs) <= N_TERM_BUCKETS
