"""Hybrid retrieval: sparse (BM25) ⊕ dense (embedding cosine) fusion.

The standard RAG retrieval shape (Cormack, Clarke & Büttcher,
"Reciprocal rank fusion outperforms Condorcet and individual rank
learning methods", SIGIR 2009): run a lexical ranker and a vector
ranker independently, take each one's top-K, and fuse by reciprocal
rank — RRF(d) = Σ_lists 1/(C + rank_list(d)) — which needs no score
calibration between the two lists.

Scale shape: each side ends in TakeOrderedAndProject (per-partition
heaps, no global sort over the corpus); ranks and the fusion join then
run on two K-row frames — parameters, not data. At 100 TB the sparse
side reads the stored postings table and the dense side the ANN layout
(``similarity_layout.ivfpq_probe``); this module fuses whatever two
ranked lists it is given, with the declared query using the in-module
exact forms so the DuckDB oracle can replay both rankers end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from node_js_etl_processor_spark.operators.similarity import (
    _probe_vector,
    brute_force_topk,
)
from node_js_etl_processor_spark.operators.text import (
    BM25_QUERY_TERMS,
    bm25_scores_narrow,
)

#: RRF smoothing constant (C=60 — the SIGIR 2009 paper's value).
RRF_C = 60


def rrf_fuse(
    sparse: DataFrame,
    dense: DataFrame,
    k: int = 10,
    c: int = RRF_C,
) -> DataFrame:
    """Fuse a (doc_id, bm25) and a (doc_id, cosine) ranked frame by
    reciprocal rank. Both inputs must already be top-K-bounded — the
    row_number windows here are global, correct ONLY because they run
    over K-row frames (the TakeOrderedAndProject outputs), never the
    corpus. A doc present in one list only gets that list's
    contribution (the other term coalesces to 0)."""
    w_s = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    w_d = Window.orderBy(F.col("cosine").desc(), F.col("doc_id").asc())
    s = sparse.select(
        "doc_id", "bm25", F.row_number().over(w_s).alias("r_s")
    )
    d = dense.select(
        "doc_id", "cosine", F.row_number().over(w_d).alias("r_d")
    )
    fused = s.join(d, "doc_id", "full_outer").select(
        "doc_id",
        "bm25",
        "cosine",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(float(c)) + F.col("r_s")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(float(c)) + F.col("r_d")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), F.col("doc_id").asc()).limit(k)


def q_hybrid_search(
    documents: DataFrame,
    embeddings: DataFrame,
    k: int = 10,
    k_fuse: int = 50,
) -> DataFrame:
    """Declared query: hybrid top-k — BM25 over the fixed query terms
    ⊕ exact cosine against probe vec_id=0, joined on doc_id = vec_id,
    fused by RRF with C=60 over each side's top-50. Fully
    oracle-checked: the SQL replays BOTH rankers (the q_bm25 postings
    chain, the q_similarity_topk cosine), both row_number rank
    assignments (same tiebreaks) and the fusion arithmetic."""
    sparse = (
        bm25_scores_narrow(documents, BM25_QUERY_TERMS)
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(k_fuse)
    )
    probe = _probe_vector(embeddings, 0)
    dense = (
        brute_force_topk(embeddings, probe, k=k_fuse, exclude_vec_id=0)
        .withColumnRenamed("vec_id", "doc_id")
        .select("doc_id", "cosine")
    )
    return rrf_fuse(sparse, dense, k=k)


def hybrid_search_from_stores(
    spark,
    bm25_path: str,
    ann_path: str,
    probe: list[float],
    query_terms: tuple[str, ...] = BM25_QUERY_TERMS,
    k: int = 10,
    k_fuse: int = 50,
    n_cells: int = 8,
    n_probe_cells: int = 4,
    rescore: int | None = 4,
    exclude_vec_id: int | None = None,
    centroids: list[list[float]] | None = None,
    pq_codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """The production (stored-forms) hybrid search this module's
    header describes: the sparse side reads the BM25 postings index
    (``sources.bm25_index.bm25_from_index`` — partition-pruned
    postings, text never read) and the dense side probes the IVFADC
    layout (``sources.similarity_layout.ivfpq_probe`` — cell-pruned
    scan of (vec_id, cell, codes) with an exact-rescore tail), fused
    by the same ``rrf_fuse`` as the declared exact form.

    Same output schema as ``q_hybrid_search``. Fidelity contract
    (test-pinned in tests/test_bm25_index.py): the sparse branch is
    EXACTLY ``bm25_scores_narrow`` on the indexed corpus, so any
    divergence from the exact form comes from the dense side's ANN
    approximation alone — bounded by the rescore tail and measured as
    overlap@k against ``q_hybrid_search`` (number recorded in
    SCALE.md). Pass the SAME ``centroids`` / ``pq_codebooks`` the
    layout was written with.

    ``n_probe_cells`` defaults to 4 of 8 here (vs ivfpq_probe's bare
    default of 2): fusion ranks are sensitive to dense-side recall,
    and the measured curve (SCALE.md §ANN) shows 2/8 cells is too
    thin a shortlist for a quality-bearing retrieval surface — half
    the cells with a rescore tail still reads only the stored codes
    plus R·k exact rows.
    """
    from node_js_etl_processor_spark.sources.bm25_index import bm25_from_index
    from node_js_etl_processor_spark.sources.similarity_layout import ivfpq_probe

    sparse = (
        bm25_from_index(spark, bm25_path, query_terms)
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(k_fuse)
    )
    dense = (
        ivfpq_probe(
            spark,
            ann_path,
            probe,
            k=k_fuse,
            n_cells=n_cells,
            n_probe_cells=n_probe_cells,
            rescore=rescore,
            exclude_vec_id=exclude_vec_id,
            centroids=centroids,
            pq_codebooks=pq_codebooks,
        )
        .withColumnRenamed("vec_id", "doc_id")
        .select("doc_id", "cosine")
    )
    return rrf_fuse(sparse, dense, k=k)
