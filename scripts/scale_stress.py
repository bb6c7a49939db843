#!/usr/bin/env python
"""Synthetic 10x scale stress for the dedup/similarity family + skew demo.

Builds a ~50k-doc / ~20k-vector corpus by explode-multiplying the
sf0.1 fixtures REPLICA_N times into tmp parquet, then times the heavy
dedup/similarity queries at 1x and 10x and reports the wall-time
ratio. The 100 TB claims elsewhere are plan-shape arguments; this
script turns one scaling point into a measurement so constant-factor
surprises (band-bucket skew, per-cell quadratics) show up as a
super-linear ratio.

Corpus construction keeps the DUPLICATE STRUCTURE linear in the
multiplier — the point is to scale the input, not the output:

- documents: replica i gets doc_id + i*1e9 and every token prefixed
  with "r{letter_i}" (one regexp pass; the tag is ALPHABETIC so the
  multiplied docs still pass alpha-word quality gates — a digit tag
  silently empties the curation pipeline and the 10x point measures
  nothing). Within a replica the corpus is isomorphic to the original
  (identical shingle/dup structure); across replicas no shingle ever
  matches, so candidate pairs scale exactly linearly.
- embeddings: replica i gets vec_id + i*1e9 and the vector rotated by
  i lanes — different directions per replica, so cross-replica
  cosines stay spread like the original corpus rather than collapsing
  onto duplicate rays.

The SKEW corpus additionally reassigns 50% of all documents to one
hot source ("src_hot") to demonstrate the skew tooling
(functions/skew.py) where it matters: per-task shuffle row counts for
a source-keyed exchange, unsalted vs salted.

Usage: python scripts/scale_stress.py [--replicas N] [--runs N]
Writes one JSON document to stdout; SCALE.md records the round's
numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPLICA_KEY = 1_000_000_000


def multiply_documents(docs: DataFrame, replicas: int) -> DataFrame:
    """Explode-multiply with per-replica token prefixes (see module
    docstring for why this keeps dup structure linear)."""
    if replicas > 26:
        raise ValueError("letter-tagged replicas support at most 26")
    rep = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("rep")
    out = docs.select("*", rep)
    tag = F.concat(F.lit("r"), F.chr(F.col("rep") + F.lit(97)))  # ra, rb, ...
    text = F.regexp_replace(F.col("text"), r"(\S+)", F.concat(tag, F.lit("$1")))
    # regexp_replace interpolates $1; the replica tag must come via
    # concat so each replica writes a distinct literal-free plan
    return out.select(
        (F.col("doc_id") + F.col("rep").cast("bigint") * REPLICA_KEY).alias("doc_id"),
        text.alias("text"),
        "lang",
        "source",
        F.length(text).cast("bigint").alias("n_chars"),
    )


def multiply_embeddings(emb: DataFrame, replicas: int) -> DataFrame:
    rep = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("rep")
    out = emb.select("*", rep)
    dim = 64
    rotated = F.concat(
        F.expr(f"slice(embedding, rep % {dim} + 1, {dim} - rep % {dim})"),
        F.expr(f"slice(embedding, 1, rep % {dim})"),
    )
    keep = ["label"] if "label" in emb.columns else []
    return out.select(
        (F.col("vec_id") + F.col("rep").cast("bigint") * REPLICA_KEY).alias("vec_id"),
        rotated.alias("embedding"),
        *keep,
    )


def _rep(replicas: int):
    return F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("rep")


def multiply_orders(orders: DataFrame, replicas: int) -> DataFrame:
    """Replica i offsets o_orderkey; o_custkey is KEPT so per-customer
    order streams get ``replicas``× deeper (the SCD2/count stress),
    and dates are kept so same-day tie-breaking is exercised."""
    out = orders.select("*", _rep(replicas))
    return out.select(
        (F.col("o_orderkey") + F.col("rep").cast("bigint") * REPLICA_KEY).alias(
            "o_orderkey"
        ),
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )


def multiply_lineitem(li: DataFrame, replicas: int) -> DataFrame:
    """Order-key offsets MATCH multiply_orders so fact-fact joins
    still land; supp/part keys kept (graph nodes unchanged, weights
    scale)."""
    out = li.select("*", _rep(replicas))
    return out.select(
        (F.col("l_orderkey") + F.col("rep").cast("bigint") * REPLICA_KEY).alias(
            "l_orderkey"
        ),
        *[c for c in li.columns if c != "l_orderkey"],
    )


def multiply_customer(cust: DataFrame, replicas: int) -> DataFrame:
    """Replica i gets a TWO-letter name tag (edit distance 2 between
    replicas, so FastSS pair structure stays linear — a one-letter tag
    would put every cross-replica name pair at distance 1 and grow
    output quadratically in the multiplier)."""
    out = cust.select("*", _rep(replicas))
    tag = F.concat(
        F.lit("r"),
        F.chr(F.col("rep") + F.lit(97)),
        F.chr(F.col("rep") + F.lit(97)),
        F.lit(" "),
    )
    return out.select(
        (F.col("c_custkey") + F.col("rep").cast("bigint") * REPLICA_KEY).alias(
            "c_custkey"
        ),
        F.concat(tag, F.col("c_name")).alias("c_name"),
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
    )


def multiply_events(ev: DataFrame, replicas: int) -> DataFrame:
    """Replica i offsets event_id (the %97 gap-fill thinning then
    samples different rows per replica — denser spines, same shape)."""
    out = ev.select("*", _rep(replicas))
    return out.select(
        (F.col("event_id") + F.col("rep").cast("bigint") * REPLICA_KEY).alias(
            "event_id"
        ),
        *[c for c in ev.columns if c != "event_id"],
    )


def multiply_part(part: DataFrame, replicas: int) -> DataFrame:
    """Replica i offsets p_partkey ONLY — (price, size) pairs repeat,
    so the skyline's pair-collapse stage absorbs the whole multiplier
    (that IS the scale claim: corpus-sized input, pair-domain-sized
    everything after)."""
    out = part.select("*", _rep(replicas))
    return out.select(
        (F.col("p_partkey") + F.col("rep").cast("bigint") * REPLICA_KEY).alias(
            "p_partkey"
        ),
        *[c for c in part.columns if c != "p_partkey"],
    )


def skew_sources(docs: DataFrame) -> DataFrame:
    """Reassign 50% of documents (even doc_id) to one hot source."""
    return docs.withColumn(
        "source",
        F.when(F.col("doc_id") % 2 == 0, F.lit("src_hot")).otherwise(F.col("source")),
    )


def timed(df_fn, runs: int) -> float:
    df_fn().write.format("noop").mode("overwrite").save()  # warm
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df_fn().write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 3)


def per_task_rows(df: DataFrame, keys: list[str], n_parts: int = 32) -> list[int]:
    """Rows landing in each shuffle partition for a keys-keyed
    exchange — the direct measure of task skew for that shuffle."""
    counts = (
        df.repartition(n_parts, *[F.col(k) for k in keys])
        .select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    by_pid = {r["pid"]: r["count"] for r in counts}
    return [by_pid.get(i, 0) for i in range(n_parts)]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--only", nargs="+", default=None,
        help="time only these families (solo re-measure mode); "
             "skips the scan/scd2/append/skew sections",
    )
    args = ap.parse_args()
    if args.replicas < 2:
        # every family (and the edge/vocab/span store families in
        # particular) keys its results as sec_1x vs sec_{replicas}x —
        # replicas=1 silently collides the keys and reports ratio 1.0
        raise SystemExit("--replicas must be >= 2 (sec_1x / sec_Nx "
                         "result keys collide at 1)")

    from node_js_etl_processor_spark.operators import dedup, retrieval, similarity, text
    from node_js_etl_processor_spark.functions.skew import _salt, salted_count
    from node_js_etl_processor_spark.session import get_spark

    spark = get_spark(app_name="scale_stress", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    docs1 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb1 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    tmp = tempfile.mkdtemp(prefix="scale_stress_")
    docs_path = os.path.join(tmp, "documents_10x")
    emb_path = os.path.join(tmp, "embeddings_10x")
    skew_path = os.path.join(tmp, "documents_10x_skew")
    multiply_documents(docs1, args.replicas).repartition(32).write.parquet(docs_path)
    multiply_embeddings(emb1, args.replicas).repartition(32).write.parquet(emb_path)
    skew_sources(spark.read.parquet(docs_path)).write.parquet(skew_path)
    docs10 = spark.read.parquet(docs_path)
    emb10 = spark.read.parquet(emb_path)
    docsk = spark.read.parquet(skew_path)

    queries = {
        "q_dedup_minhash": (lambda: dedup.q_dedup_minhash(docs1),
                            lambda: dedup.q_dedup_minhash(docs10)),
        "q_dedup_simhash": (lambda: dedup.q_dedup_simhash(docs1),
                            lambda: dedup.q_dedup_simhash(docs10)),
        "q_dedup_clusters": (lambda: dedup.q_dedup_clusters(docs1),
                             lambda: dedup.q_dedup_clusters(docs10)),
        # auto-sized blocking (the scale path): n_cells grows ~sqrt(n)
        # at BOTH points, so the ratio measures the engine, not a
        # fixture-pinned parameter cliff
        "semdedup_auto": (lambda: similarity.semdedup(emb1),
                          lambda: similarity.semdedup(emb10)),
        "q_curation_pipeline": (lambda: text.q_curation_pipeline(docs1),
                                lambda: text.q_curation_pipeline(docs10)),
        # r6-new operators: LM perplexity (two corpus passes + bcast
        # vocab join), temperature sampler (aggregated-frame windows),
        # PQ encode (Arrow kernel) and inline-ADC top-k
        "q_lm_perplexity": (lambda: text.q_lm_perplexity(docs1),
                            lambda: text.q_lm_perplexity(docs10)),
        "q_weighted_sample": (lambda: text.q_weighted_sample(docs1),
                              lambda: text.q_weighted_sample(docs10)),
        "q_pq_encode": (lambda: similarity.q_pq_encode(emb1),
                        lambda: similarity.q_pq_encode(emb10)),
        "q_pq_topk": (lambda: similarity.q_pq_topk(emb1),
                      lambda: similarity.q_pq_topk(emb10)),
        # r7-new operators: bigram LM (three vocab-keyed aggs +
        # broadcast scoring joins), HTML extraction + URL dedup
        # (narrow regexp chains — should scale at scan bandwidth)
        "q_lm_bigram_perplexity": (
            lambda: text.q_lm_bigram_perplexity(docs1),
            lambda: text.q_lm_bigram_perplexity(docs10),
        ),
        "q_html_extract": (lambda: text.q_html_extract(docs1),
                           lambda: text.q_html_extract(docs10)),
        "q_url_dedup": (lambda: text.q_url_dedup(docs1),
                        lambda: text.q_url_dedup(docs10)),
        # r7 similarity/retrieval additions: pooling (one keyed agg),
        # semantic decontamination (SRP-blocked cross join), hybrid
        # RRF (two top-k rankers + 50-row fusion)
        "q_embedding_pool": (lambda: similarity.q_embedding_pool(emb1),
                             lambda: similarity.q_embedding_pool(emb10)),
        # decontamination's production regime: the EVAL side is a
        # FIXED parameter-sized benchmark suite while the train corpus
        # grows — so the stress multiplies train only. (Multiplying
        # both sides is quadratic BY DESIGN since the r8 recall-first
        # banding intentionally barely prunes at threshold 0.30 —
        # similarity.py documents that physics; it is not the
        # deployment shape.)
        "semantic_decontaminate_fixed_evals": (
            lambda: similarity.semantic_decontaminate(
                emb1.filter(F.col("vec_id") % 10 != 0),
                emb1.filter(F.col("vec_id") % 10 == 0),
            ),
            lambda: similarity.semantic_decontaminate(
                emb10.filter(F.col("vec_id") % 10 != 0),
                emb1.filter(F.col("vec_id") % 10 == 0),
            ),
        ),
        "q_hybrid_search": (
            lambda: retrieval.q_hybrid_search(docs1, emb1),
            lambda: retrieval.q_hybrid_search(docs10, emb10),
        ),
    }

    # ---- landing-zone compaction (batch half of the ingest split):
    # build the zone with the capstone's exact stateless prefix (gate →
    # chunk → fp, the same expressions curation_chunk_stream runs) at
    # both scales, then time the compact suffix over each
    from node_js_etl_processor_spark.operators.text import (
        chunk_documents,
        curation_keep,
    )
    from node_js_etl_processor_spark.streaming.curation import compact_landing_zone

    def build_zone(docs: DataFrame, path: str) -> None:
        kept = docs.filter(curation_keep(F.col("text"), F.col("lang"))).select(
            "doc_id", "text"
        )
        chunk_documents(kept).withColumn(
            "chunk_fp", F.md5(F.col("chunk_text"))
        ).write.parquet(path)

    zone1 = os.path.join(tmp, "zone_1x")
    zone10 = os.path.join(tmp, "zone_10x")
    build_zone(docs1, zone1)
    build_zone(docs10, zone10)
    queries["compact_landing_zone"] = (
        lambda: compact_landing_zone(spark, zone1),
        lambda: compact_landing_zone(spark, zone10),
    )

    # ---- production ANN layout: stored-residual-code IVFADC probe ----
    from node_js_etl_processor_spark.sources.similarity_layout import (
        ivfpq_probe,
        write_ann_layout,
    )

    lay1 = os.path.join(tmp, "ann_1x")
    lay10 = os.path.join(tmp, "ann_10x")
    write_ann_layout(emb1, lay1)
    write_ann_layout(emb10, lay10)
    probe = similarity._probe_vector(emb1, 0)
    queries["ivfpq_probe_layout"] = (
        lambda: ivfpq_probe(spark, lay1, probe, k=10, exclude_vec_id=0),
        lambda: ivfpq_probe(spark, lay10, probe, k=10, exclude_vec_id=0),
    )

    # ---- r8 families: the WAV feature pass (chained mapInPandas,
    # should scale at kernel bandwidth), the incremental delta probes
    # (FIXED drop against a 10x store — the production access pattern;
    # cost should track candidate volume, not corpus re-hash), and the
    # stored-forms hybrid fusion (both sides partition-pruned probes —
    # should be ~flat in corpus size)
    from node_js_etl_processor_spark.operators.multimodal import q_audio_features
    from node_js_etl_processor_spark.operators.retrieval import (
        hybrid_search_from_stores,
    )
    from node_js_etl_processor_spark.sources.bm25_index import write_bm25_index
    from node_js_etl_processor_spark.sources.dedup_store import (
        dedup_simhash_delta,
        write_simhash_store,
    )
    from node_js_etl_processor_spark.sources.similarity_layout import (
        dedup_embedding_delta,
    )

    queries["q_audio_features"] = (
        lambda: q_audio_features(docs1),
        lambda: q_audio_features(docs10),
    )
    drop = docs1.filter(F.col("doc_id") % 20 == 0)
    sh1 = os.path.join(tmp, "sh_1x")
    sh10 = os.path.join(tmp, "sh_10x")
    write_simhash_store(docs1, sh1)
    write_simhash_store(docs10, sh10)
    queries["dedup_simhash_delta"] = (
        lambda: dedup_simhash_delta(spark, drop, sh1),
        lambda: dedup_simhash_delta(spark, drop, sh10),
    )
    edrop = emb1.filter(F.col("vec_id") % 20 == 0)
    queries["dedup_embedding_delta"] = (
        lambda: dedup_embedding_delta(spark, edrop, lay1),
        lambda: dedup_embedding_delta(spark, edrop, lay10),
    )
    bm1 = os.path.join(tmp, "bm_1x")
    bm10 = os.path.join(tmp, "bm_10x")
    write_bm25_index(docs1, bm1)
    write_bm25_index(docs10, bm10)
    queries["hybrid_from_stores"] = (
        lambda: hybrid_search_from_stores(spark, bm1, lay1, probe, exclude_vec_id=0),
        lambda: hybrid_search_from_stores(spark, bm10, lay10, probe, exclude_vec_id=0),
    )

    # ---- r8 relational/text/sketch/graph queries over multiplied
    # orders/customer/lineitem/events fixtures ----
    from node_js_etl_processor_spark.operators import graph, relational, sketch, temporal

    orders1 = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    cust1 = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    li1 = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    ev1 = spark.read.parquet(f"{SF_DIR}/events.parquet")
    supp1 = spark.read.parquet(f"{SF_DIR}/supplier.parquet")
    orders_path = os.path.join(tmp, "orders_10x")
    cust_path = os.path.join(tmp, "customer_10x")
    li_path = os.path.join(tmp, "lineitem_10x")
    ev_path = os.path.join(tmp, "events_10x")
    multiply_orders(orders1, args.replicas).repartition(32).write.parquet(orders_path)
    multiply_customer(cust1, args.replicas).repartition(32).write.parquet(cust_path)
    multiply_lineitem(li1, args.replicas).repartition(32).write.parquet(li_path)
    multiply_events(ev1, args.replicas).repartition(32).write.parquet(ev_path)
    orders10 = spark.read.parquet(orders_path)
    cust10 = spark.read.parquet(cust_path)
    li10 = spark.read.parquet(li_path)
    ev10 = spark.read.parquet(ev_path)

    queries["q_scd2"] = (
        lambda: relational.q_scd2(orders1),
        lambda: relational.q_scd2(orders10),
    )
    queries["q_fuzzy_match"] = (
        lambda: dedup.q_fuzzy_match(cust1),
        lambda: dedup.q_fuzzy_match(cust10),
    )
    queries["q_tfidf"] = (
        lambda: text.q_tfidf(docs1),
        lambda: text.q_tfidf(docs10),
    )
    queries["q_gap_fill"] = (
        lambda: temporal.q_gap_fill(ev1),
        lambda: temporal.q_gap_fill(ev10),
    )
    queries["q_countmin"] = (
        lambda: sketch.q_countmin(orders1),
        lambda: sketch.q_countmin(orders10),
    )
    queries["q_pagerank"] = (
        lambda: graph.q_pagerank(li1, orders1, cust1, supp1),
        lambda: graph.q_pagerank(li10, orders10, cust10, supp1),
    )
    queries["q_kl_divergence"] = (
        lambda: text.q_kl_divergence(docs1),
        lambda: text.q_kl_divergence(docs10),
    )
    from node_js_etl_processor_spark.operators import sessionize

    queries["q_retention"] = (
        lambda: temporal.q_retention(ev1),
        lambda: temporal.q_retention(ev10),
    )
    queries["q_funnel"] = (
        lambda: sessionize.q_funnel(ev1),
        lambda: sessionize.q_funnel(ev10),
    )

    # ---- r9 operators: convergence PageRank (fixed 10 rounds so both
    # scales do identical iteration counts — measures per-round edge
    # aggregation scaling), hardened fuzzy match with the hot-key cap
    # engaged, and REAL GIF frame sampling over synthesized payloads
    # (mapInPandas kernel bandwidth — the multimodal scaling shape)
    from node_js_etl_processor_spark.operators.graph import pagerank_until
    from node_js_etl_processor_spark.operators.multimodal import (
        sample_gif_frames,
        synth_gif_media,
    )

    queries["pagerank_until_10r"] = (
        lambda: pagerank_until(
            graph.trade_edges(li1, orders1, cust1, supp1),
            eps=0.0, max_iter=10, require_convergence=False,
        ),
        lambda: pagerank_until(
            graph.trade_edges(li10, orders10, cust10, supp1),
            eps=0.0, max_iter=10, require_convergence=False,
        ),
    )
    queries["q_fuzzy_match_capped"] = (
        lambda: dedup.q_fuzzy_match(cust1, key_cap=1000),
        lambda: dedup.q_fuzzy_match(cust10, key_cap=1000),
    )
    if args.only is None or "sample_gif_frames" in args.only:
        # the synth corpus build is itself expensive (per-doc LZW
        # encodes) — skip it when the family isn't selected
        gif1 = os.path.join(tmp, "gif_1x")
        gif10 = os.path.join(tmp, "gif_10x")
        synth_gif_media(docs1).write.parquet(gif1)
        synth_gif_media(docs10).write.parquet(gif10)
        gmedia1 = spark.read.parquet(gif1)
        gmedia10 = spark.read.parquet(gif10)
        queries["sample_gif_frames"] = (
            lambda: sample_gif_frames(gmedia1),
            lambda: sample_gif_frames(gmedia10),
        )
    # BPE first-step pair stats (one corpus pass + vocab-sized agg)
    # and the link-graph builder (codegen regexp chain + one keyed agg)
    from node_js_etl_processor_spark.operators.bpe import bpe_top_pairs
    from node_js_etl_processor_spark.operators.graph import q_link_graph

    queries["bpe_top_pairs"] = (
        lambda: bpe_top_pairs(docs1),
        lambda: bpe_top_pairs(docs10),
    )
    queries["q_link_graph"] = (
        lambda: q_link_graph(docs1),
        lambda: q_link_graph(docs10),
    )


    # ---- r10 operators: the composed BPE token budget (train 8
    # merges + Arrow-batched encode + one source agg — end-to-end cost
    # including the trainer's 8 driver round-trips at both scales) and
    # REAL MJPEG-AVI frame sampling over synthesized payloads (RIFF
    # walk + per-frame JPEG decode — the video kernel-bandwidth shape)
    from node_js_etl_processor_spark.operators.bpe import q_token_budget
    from node_js_etl_processor_spark.operators.multimodal import (
        sample_video_frames,
        synth_video_media,
    )

    queries["q_token_budget"] = (
        lambda: q_token_budget(docs1),
        lambda: q_token_budget(docs10),
    )
    if args.only is None or "sample_video_frames" in args.only:
        vid1 = os.path.join(tmp, "vid_1x")
        vid10 = os.path.join(tmp, "vid_10x")
        synth_video_media(docs1).write.parquet(vid1)
        synth_video_media(docs10).write.parquet(vid10)
        vmedia1 = spark.read.parquet(vid1)
        vmedia10 = spark.read.parquet(vid10)
        queries["sample_video_frames"] = (
            lambda: sample_video_frames(vmedia1),
            lambda: sample_video_frames(vmedia10),
        )

    # ---- r10 late additions: the edge store's append cost vs store
    # size (mergeable partials — must be flat) and its generational
    # compaction cost (reads the log, so it scales WITH the store by
    # design; the point is the measured constant, not the ratio)
    from node_js_etl_processor_spark.sources.graph_store import (
        append_edge_store,
        compact_edge_store,
        write_edge_store,
    )

    def _edge_family(results_dict):
        want_app = args.only is None or "edge_append_fixed_batch" in args.only
        want_cmp = args.only is None or "edge_compaction" in args.only
        res_app, res_cmp = {}, {}
        for scale, base in (("1x", docs1), (f"{args.replicas}x", docs10)):
            spath = os.path.join(tmp, f"edges_{scale}")
            write_edge_store(base, spath)
            ts = []
            for _ in (1, 2):
                t0 = time.perf_counter()
                append_edge_store(docs1.limit(500), spath)
                ts.append(time.perf_counter() - t0)
            res_app[f"sec_{scale}"] = round(statistics.median(ts), 3)
            t0 = time.perf_counter()
            compact_edge_store(spark, spath)
            res_cmp[f"sec_{scale}"] = round(time.perf_counter() - t0, 3)
        for res in (res_app, res_cmp):
            res["ratio"] = (
                round(res[f"sec_{args.replicas}x"] / res["sec_1x"], 2)
                if res["sec_1x"] > 0
                else None
            )
        if want_app:
            results_dict["edge_append_fixed_batch"] = res_app
            print(f"[edge_append_fixed_batch] {res_app}", file=sys.stderr)
        if want_cmp:
            results_dict["edge_compaction"] = res_cmp
            print(f"[edge_compaction] {res_cmp}", file=sys.stderr)

    def _vocab_family(results_dict):
        # the vocab lane's maintenance costs, the edge-family shape:
        # a FIXED 500-doc append against a 1x vs 10x store must cost
        # the same (append never reads the store); compaction folds
        # the log and scales with stored vocabulary
        from node_js_etl_processor_spark.sources.vocab_store import (
            append_vocab_store,
            compact_vocab_store,
            write_vocab_store,
        )

        want_app = args.only is None or "vocab_append_fixed_batch" in args.only
        want_cmp = args.only is None or "vocab_compaction" in args.only
        res_app, res_cmp = {}, {}
        for scale, base in (("1x", docs1), (f"{args.replicas}x", docs10)):
            spath = os.path.join(tmp, f"vocab_{scale}")
            write_vocab_store(base, spath)
            ts = []
            for _ in (1, 2):
                t0 = time.perf_counter()
                append_vocab_store(docs1.limit(500), spath)
                ts.append(time.perf_counter() - t0)
            res_app[f"sec_{scale}"] = round(statistics.median(ts), 3)
            t0 = time.perf_counter()
            compact_vocab_store(spark, spath)
            res_cmp[f"sec_{scale}"] = round(time.perf_counter() - t0, 3)
        for res in (res_app, res_cmp):
            res["ratio"] = (
                round(res[f"sec_{args.replicas}x"] / res["sec_1x"], 2)
                if res["sec_1x"] > 0
                else None
            )
        if want_app:
            results_dict["vocab_append_fixed_batch"] = res_app
            print(f"[vocab_append_fixed_batch] {res_app}", file=sys.stderr)
        if want_cmp:
            results_dict["vocab_compaction"] = res_cmp
            print(f"[vocab_compaction] {res_cmp}", file=sys.stderr)

    def _span_family(results_dict):
        # r17: the novelty drop-scoring read path (spanstore.
        # score_drop_novelty) — a FIXED drop scored against a 1x vs
        # 10x shingle-postings store. The store is touched by one
        # broadcast-semi-filtered counting pass, so the cost must
        # grow with the store SCAN (bandwidth-bound), never with a
        # store-wide shuffle — the designed band is well under the
        # corpus multiplier
        from node_js_etl_processor_spark.operators.novelty import (
            novelty_of_drop,
        )
        from node_js_etl_processor_spark.operators.spans import (
            shingle_positions,
        )

        # the drop's doc_ids must be NEW to the store (the operator's
        # documented ingest precondition) — scoring already-stored ids
        # measures the degenerate all-duplicated path, not the
        # representative sparse-duplication gate (r17 second review)
        drop = docs1.filter(F.col("doc_id") % 10 == 0)
        res = {}
        for scale, base in (("1x", docs1), (f"{args.replicas}x", docs10)):
            spath = os.path.join(tmp, f"spanstore_{scale}")
            shingle_positions(base.filter(F.col("doc_id") % 10 != 0)).write.parquet(spath)
            stored = spark.read.parquet(spath)
            ts = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                novelty_of_drop(drop, stored).write.format("noop").mode(
                    "overwrite"
                ).save()
                ts.append(time.perf_counter() - t0)
            res[f"sec_{scale}"] = round(statistics.median(ts), 3)
        res["ratio"] = (
            round(res[f"sec_{args.replicas}x"] / res["sec_1x"], 2)
            if res["sec_1x"] > 0
            else None
        )
        results_dict["novelty_drop_fixed"] = res
        print(f"[novelty_drop_fixed] {res}", file=sys.stderr)

    # ---- r10-continuation operators: both compressed-audio loops
    # (G.711 companding is vectorized numpy per batch; ADPCM is the
    # per-row stateful nibble loop — the expensive one, measuring the
    # per-payload Python cost the media family budgets for), the
    # oracle-checkable HLL (pure codegen hash + two bucket-bounded
    # aggs — must be flat-ish like countmin), and the HDR quantile
    # histogram (one data-sized partial-agg shuffle + bucket-row fold)
    from node_js_etl_processor_spark.operators.audio import (
        q_audio_adpcm,
        q_audio_g711,
    )
    from node_js_etl_processor_spark.operators.sketch import (
        q_hdr_quantiles,
        q_hll_distinct,
    )

    queries["q_audio_g711"] = (
        lambda: q_audio_g711(docs1),
        lambda: q_audio_g711(docs10),
    )
    queries["q_audio_adpcm"] = (
        lambda: q_audio_adpcm(docs1),
        lambda: q_audio_adpcm(docs10),
    )
    queries["q_hll_distinct"] = (
        lambda: q_hll_distinct(orders1),
        lambda: q_hll_distinct(orders10),
    )
    queries["q_hdr_quantiles"] = (
        lambda: q_hdr_quantiles(li1),
        lambda: q_hdr_quantiles(li10),
    )
    # r11 candidate families measured ahead of declaration
    from node_js_etl_processor_spark.operators.netpbm import q_netpbm_features
    from node_js_etl_processor_spark.operators.sketch import (
        q_hll_intersect,
        q_hll_rollup,
    )

    queries["q_netpbm_features"] = (
        lambda: q_netpbm_features(docs1),
        lambda: q_netpbm_features(docs10),
    )
    queries["q_hll_rollup"] = (
        lambda: q_hll_rollup(orders1),
        lambda: q_hll_rollup(orders10),
    )
    queries["q_hll_intersect"] = (
        lambda: q_hll_intersect(orders1),
        lambda: q_hll_intersect(orders10),
    )
    from node_js_etl_processor_spark.operators.audio import q_audio_probe

    queries["q_audio_probe"] = (
        lambda: q_audio_probe(docs1),
        lambda: q_audio_probe(docs10),
    )
    from node_js_etl_processor_spark.operators.sketch import q_hll_timeline
    from node_js_etl_processor_spark.operators.tiff import q_tiff_features

    queries["q_hll_timeline"] = (
        lambda: q_hll_timeline(ev1),
        lambda: q_hll_timeline(ev10),
    )
    queries["q_tiff_features"] = (
        lambda: q_tiff_features(docs1),
        lambda: q_tiff_features(docs10),
    )
    # r13 families: the perf-watch quartet's missing member (winnowing
    # fingerprints: shingle explode → window-min select — one keyed
    # exchange over the exploded frame, so the ratio should track the
    # exploded row count linearly)
    queries["q_winnow_fingerprint"] = (
        lambda: text.q_winnow_fingerprint(docs1),
        lambda: text.q_winnow_fingerprint(docs10),
    )
    # r13 declarations: the FLAC family (bit-level Python codec — the
    # honest per-payload band; embarrassingly parallel, so the 10x
    # ratio should stay near the ADPCM/probe band), Misra-Gries exact
    # top-k (partials are capacity-bounded per partition, so the 10x
    # point pays the scan + a parameter-sized merge — the countmin
    # band), and dHash image near-dup (one Arrow decode pass + one
    # 8-byte-key exchange — the vectorized-media band)
    from node_js_etl_processor_spark.operators.flac import q_audio_flac
    from node_js_etl_processor_spark.operators.heavy import q_heavy_hitters
    from node_js_etl_processor_spark.operators.phash import q_image_dedup

    queries["q_audio_flac"] = (
        lambda: q_audio_flac(docs1),
        lambda: q_audio_flac(docs10),
    )
    queries["q_heavy_hitters"] = (
        lambda: q_heavy_hitters(orders1),
        lambda: q_heavy_hitters(orders10),
    )
    queries["q_image_dedup"] = (
        lambda: q_image_dedup(docs1),
        lambda: q_image_dedup(docs10),
    )
    from node_js_etl_processor_spark.operators.phash import q_image_neardup

    queries["q_image_neardup"] = (
        lambda: q_image_neardup(docs1),
        lambda: q_image_neardup(docs10),
    )

    # ---- r14 operators: image format dispatch probe (headers-only
    # Arrow pass), the Misra-Gries CERTIFIED path (skewed keys so the
    # sketch->broadcast-recount branch runs at both scales), the exact
    # set-similarity join (collapse + prefix join + digest verify —
    # replica token prefixes keep the near-dup structure linear), and
    # the dHash band join under an ADVERSARIAL templated corpus with
    # the hot-key cap engaged (the q_fuzzy_match_capped discipline on
    # the perceptual key: every hash shares bands 0 and 1, so the
    # uncapped join would be quadratic in corpus size — the capped
    # family must stay ~linear instead, which is the whole claim)
    from node_js_etl_processor_spark.operators.heavy import (
        q_heavy_hitters_skewed,
    )
    from node_js_etl_processor_spark.operators.image_probe import q_image_probe
    from node_js_etl_processor_spark.operators.phash import image_near_dup_pairs
    from node_js_etl_processor_spark.operators.setsim import q_setsim_join

    queries["q_image_probe"] = (
        lambda: q_image_probe(docs1),
        lambda: q_image_probe(docs10),
    )
    queries["q_heavy_hitters_skewed"] = (
        lambda: q_heavy_hitters_skewed(orders1),
        lambda: q_heavy_hitters_skewed(orders10),
    )
    queries["q_setsim_join"] = (
        lambda: q_setsim_join(docs1),
        lambda: q_setsim_join(docs10),
    )
    from node_js_etl_processor_spark.operators.setsim import (
        q_containment_decon,
    )

    queries["q_containment_decon"] = (
        lambda: q_containment_decon(docs1),
        lambda: q_containment_decon(docs10),
    )

    def _adversarial_hashed(n):
        # n hashes all sharing band 0 (0xaaaa) and band 1 (0x1111) —
        # the templated-logo shape the r13 verdict asked the cap to
        # survive; bands 2/3 spread by a Knuth multiplier of id//2, so
        # ids 2k/2k+1 are TRUE exact-hash pairs findable through the
        # uncapped bands 2/3 (n/2 pairs — linear ground truth the
        # capped join must still emit while the hot bands drop)
        return spark.range(n).select(
            F.col("id").alias("media_id"),
            F.lit("true").alias("ok"),
            F.concat(
                F.lit("aaaa1111"),
                F.lpad(
                    F.lower(
                        F.hex(
                            ((F.col("id") / 2).cast("long") * 2654435761)
                            % F.lit(4294967296)
                        )
                    ),
                    8,
                    "0",
                ),
            ).alias("dhash"),
        )

    queries["image_neardup_capped_adversarial"] = (
        lambda: image_near_dup_pairs(_adversarial_hashed(5000), key_cap=64),
        lambda: image_near_dup_pairs(_adversarial_hashed(50000), key_cap=64),
    )

    # ---- r15 declarations: kmv / intervals / skyline ----
    from node_js_etl_processor_spark.operators import intervals, kmv, skyline

    part1 = spark.read.parquet(f"{SF_DIR}/part.parquet")
    part_path = os.path.join(tmp, "part_10x")
    multiply_part(part1, args.replicas).repartition(32).write.parquet(part_path)
    part10 = spark.read.parquet(part_path)

    queries["q_kmv_distinct"] = (
        # custkeys are KEPT by multiply_orders, so the sketch output is
        # identical at 10x — the stress measures the corpus-sized
        # distinct + salted bottom-k build, which is the only part
        # that scales.
        lambda: kmv.q_kmv_distinct(orders1),
        lambda: kmv.q_kmv_distinct(orders10),
    )
    queries["q_interval_coverage"] = (
        # multiply_events keeps user_id: each user's stream gets 10x
        # denser, so islands MERGE (rows grow sub-linearly) while the
        # per-user window sorts 10x more rows — the honest worst case
        # for the sweep.
        lambda: intervals.q_interval_coverage(ev1),
        lambda: intervals.q_interval_coverage(ev10),
    )
    queries["q_skyline"] = (
        lambda: skyline.q_skyline(part1),
        lambda: skyline.q_skyline(part10),
    )

    # ---- r16 declarations + the new span family ----
    from node_js_etl_processor_spark.operators import (
        attribution,
        basket,
        colloc,
        snm,
        spans,
    )

    queries["q_kmv_difference"] = (
        # custkeys KEPT by multiply_orders → identical sketches at
        # 10x; the ratio measures the corpus distinct + bottom-k build
        lambda: kmv.q_kmv_difference(orders1),
        lambda: kmv.q_kmv_difference(orders10),
    )
    queries["q_snm_pairs"] = (
        # two-letter replica tags keep cross-replica keys at edit
        # distance 2 and group replicas into separate sort runs, so
        # the n·w candidate budget (and the output) stays linear
        lambda: snm.q_snm_pairs(cust1),
        lambda: snm.q_snm_pairs(cust10),
    )
    queries["q_pmi_collocations"] = (
        # replica texts keep the bigram distribution: counts scale
        # 10x, the PMI gate is scale-invariant (n_xy·N² vs M·n_x·n_y
        # all pick up the same factor), so output rows stay ~fixed
        lambda: colloc.q_pmi_collocations(docs1),
        lambda: colloc.q_pmi_collocations(docs10),
    )
    queries["q_attribution"] = (
        # user_id KEPT by multiply_events → 10x denser per-user
        # streams through both RANGE frames — the honest worst case
        lambda: attribution.q_attribution(ev1),
        lambda: attribution.q_attribution(ev10),
    )
    queries["q_itemset_pairs"] = (
        # multiply_lineitem replicates whole baskets: 10x baskets,
        # same pair domain, supports scale linearly
        lambda: basket.q_itemset_pairs(li1),
        lambda: basket.q_itemset_pairs(li10),
    )
    queries["q_span_extents"] = (
        # the only corpus-sized stages are the shingle explode and
        # the hash-count window — both linear in token count
        lambda: spans.q_span_extents(docs1),
        lambda: spans.q_span_extents(docs10),
    )

    # ---- r17 candidates measured ahead of declaration ----
    from node_js_etl_processor_spark.operators import (
        novelty,
        rfm,
        seqmine,
        triangles,
    )

    queries["q_doc_novelty"] = (
        # the span family's two linear stages + one doc-keyed join
        lambda: novelty.q_doc_novelty(docs1),
        lambda: novelty.q_doc_novelty(docs10),
    )
    from node_js_etl_processor_spark.operators import robust

    queries["q_robust_stats"] = (
        # one group-keyed exchange reused by both order-statistic
        # windows; per-group sorts see 10x rows — the window band
        lambda: robust.q_robust_stats(orders1),
        lambda: robust.q_robust_stats(orders10),
    )

    queries["q_triangles"] = (
        # replicated baskets keep the edge set: the ratio measures
        # the basket build + the support aggregation, wedges are
        # edge-domain-sized at both points
        lambda: triangles.q_triangles(li1),
        lambda: triangles.q_triangles(li10),
    )
    queries["q_event_sequences"] = (
        lambda: seqmine.q_event_sequences(ev1),
        lambda: seqmine.q_event_sequences(ev10),
    )
    queries["q_rfm_segments"] = (
        # o_custkey KEPT: 10x orders per customer, same customer
        # dimension through the three global ranks
        lambda: rfm.q_rfm_segments(orders1),
        lambda: rfm.q_rfm_segments(orders10),
    )

    from node_js_etl_processor_spark.operators import (
        cusum,
        diversity,
        histogram,
        paths,
        sax,
        trend,
    )

    queries["q_sax_symbols"] = (
        # user_id and ts KEPT: 10x events fold into the SAME (user,
        # hour) PAA frames — output identical, the ratio measures the
        # map-side-combined frame aggregation
        lambda: sax.q_sax_symbols(ev1),
        lambda: sax.q_sax_symbols(ev10),
    )
    queries["q_cusum_alarms"] = (
        # 10x denser per-user streams through the one window sort;
        # duplicated values accumulate the CUSUM statistic faster, so
        # ALARM rows grow super-linearly by design — work is the
        # linear window pass, rows_ratio reports the output effect
        lambda: cusum.q_cusum_alarms(ev1),
        lambda: cusum.q_cusum_alarms(ev10),
    )
    queries["q_ols_trend"] = (
        # the minimal plan: one map-side-combined aggregation, 5
        # output groups at both points
        lambda: trend.q_ols_trend(orders1),
        lambda: trend.q_ols_trend(orders10),
    )
    queries["q_simpson_diversity"] = (
        # replica-prefixed tokens: 10x token stream AND 10x vocabulary
        # through the (source, token) count — both aggregations linear
        lambda: diversity.q_simpson_diversity(docs1),
        lambda: diversity.q_simpson_diversity(docs10),
    )
    queries["q_bfs_hops"] = (
        # REPLICA_KEY is divisible by 20, so replica doc_ids map to
        # the SAME domains: identical edge set and BFS layers, the
        # ratio measures the corpus-sized edge-build scan
        lambda: paths.q_bfs_hops(docs1),
        lambda: paths.q_bfs_hops(docs10),
    )
    queries["q_equidepth_hist"] = (
        # 10x rows per returnflag through the per-group NTILE sort;
        # same 3 flags x 8 buckets out
        lambda: histogram.q_equidepth_hist(li1),
        lambda: histogram.q_equidepth_hist(li10),
    )
    from node_js_etl_processor_spark.operators import gini

    queries["q_gini_concentration"] = (
        # 10x docs per source through the one in-group rank window;
        # same 20 source rows out
        lambda: gini.q_gini_concentration(docs1),
        lambda: gini.q_gini_concentration(docs10),
    )

    if args.only:
        unknown = set(args.only) - set(queries) - {
            "edge_append_fixed_batch", "edge_compaction",
            "vocab_append_fixed_batch", "vocab_compaction",
            "novelty_drop_fixed",
        }
        if unknown:
            raise SystemExit(f"--only: unknown families {sorted(unknown)}")
        queries = {k: v for k, v in queries.items() if k in args.only}

    results = {}
    for name, (f1, f10) in queries.items():
        t1 = timed(f1, args.runs)
        t10 = timed(f10, args.runs)
        r1, r10 = f1().count(), f10().count()
        results[name] = {
            "sec_1x": t1,
            f"sec_{args.replicas}x": t10,
            "ratio": round(t10 / t1, 2) if t1 > 0 else None,
            "rows_1x": r1,
            f"rows_{args.replicas}x": r10,
            "rows_ratio": round(r10 / r1, 2) if r1 > 0 else None,
        }
        print(f"[{name}] 1x={t1}s {args.replicas}x={t10}s "
              f"ratio={results[name]['ratio']} rows {r1}->{r10}", file=sys.stderr)

    if args.only is None or {
        "edge_append_fixed_batch", "edge_compaction"
    } & set(args.only):
        _edge_family(results)

    if args.only is None or {
        "vocab_append_fixed_batch", "vocab_compaction"
    } & set(args.only):
        _vocab_family(results)

    if args.only is None or "novelty_drop_fixed" in args.only:
        _span_family(results)

    scan = skew = None
    if not args.only:  # solo mode times families only
        # ---- measured scan volume for the IVFADC probe (the ~4 bytes/
        # vector claim): per-column compressed bytes from the parquet
        # footers of the PROBED cell directories vs the whole layout —
        # partition pruning bounds the file set, column pruning bounds the
        # bytes within it to (vec_id, codes)
        import glob as globmod

        import duckdb

        def col_bytes(files: list[str]) -> dict[str, int]:
            con = duckdb.connect()
            tot: dict[str, int] = {}
            for f in files:
                for path_in_schema, sz in con.execute(
                    "SELECT path_in_schema, total_compressed_size"
                    " FROM parquet_metadata(?)", [f]
                ).fetchall():
                    root = path_in_schema.split(".")[0]
                    tot[root] = tot.get(root, 0) + int(sz)
            con.close()
            return tot

        cells = similarity.probe_cell_set(probe, 8, 2)
        probed_files = [
            f for c in cells for f in globmod.glob(f"{lay10}/by_cell/cell={c}/*.parquet")
        ]
        all_files = globmod.glob(f"{lay10}/by_cell/cell=*/*.parquet")
        probed = col_bytes(probed_files)
        full = col_bytes(all_files)
        n_probed = spark.read.parquet(f"{lay10}/by_cell").filter(
            F.col("cell").isin(cells)
        ).count()
        adc_read = probed.get("vec_id", 0) + probed.get("codes", 0)
        scan = {
            "probed_cells": cells,
            "n_probed_vectors": n_probed,
            "adc_read_bytes": adc_read,
            "adc_bytes_per_vector": round(adc_read / n_probed, 2) if n_probed else None,
            "probed_all_columns_bytes": sum(probed.values()),
            "layout_all_columns_bytes": sum(full.values()),
            "read_fraction_of_layout": round(adc_read / sum(full.values()), 4),
        }
        print(f"[ivfpq_scan] {scan}", file=sys.stderr)

        # ---- r9: SCD2 CDC merge vs store size (the warehouse-tier store
        # pattern): a FIXED ~20-key CDC batch applied to a 1x vs 10x
        # stored dimension at n_buckets=256 — apply cost must track the
        # batch + its touched buckets (~|keys|/256 of the store), not the
        # store size. The apply WRITES (dynamic partition overwrite), so
        # it is timed directly over two sequential date-sliced batches
        # (the production cadence), not through the noop-write runner.
        from node_js_etl_processor_spark.sources.scd2_store import (
            scd2_apply_delta,
            write_scd2_store,
        )

        scd_keys = [r[0] for r in orders1.select("o_custkey").distinct().limit(20).collect()]
        scd2_res = {}
        for scale, odf in (("1x", orders1), (f"{args.replicas}x", orders10)):
            pre = odf.filter(F.col("o_orderdate") < "1999-01-01")
            b1 = odf.filter(
                (F.col("o_orderdate") >= "1999-01-01")
                & (F.col("o_orderdate") < "2000-06-01")
                & F.col("o_custkey").isin(scd_keys)
            )
            b2 = odf.filter(
                (F.col("o_orderdate") >= "2000-06-01")
                & F.col("o_custkey").isin(scd_keys)
            )
            spath = os.path.join(tmp, f"scd2_{scale}")
            write_scd2_store(pre, spath, n_buckets=256)
            ts = []
            for b in (b1, b2):
                t0 = time.perf_counter()
                scd2_apply_delta(spark, b, spath, n_buckets=256)
                ts.append(time.perf_counter() - t0)
            scd2_res[f"sec_{scale}"] = round(statistics.median(ts), 3)
            scd2_res[f"store_rows_{scale}"] = pre.count()
        scd2_res["ratio"] = (
            round(scd2_res[f"sec_{args.replicas}x"] / scd2_res["sec_1x"], 2)
            if scd2_res["sec_1x"] > 0
            else None
        )
        results["scd2_apply_delta_fixed_batch"] = scd2_res
        print(f"[scd2_apply_delta_fixed_batch] {scd2_res}", file=sys.stderr)

        # ---- r9: index/layout APPEND cost vs store size — the mergeable-
        # partials (bm25) and per-row-facts (ann) maintenance claims: a
        # FIXED batch appended to a 1x vs 10x store must cost ~the same
        # (appends never read the store). Fresh ids via a +1e10 offset
        # honor the new-ids append contract; two sequential appends per
        # scale, median reported.
        from node_js_etl_processor_spark.sources.bm25_index import (
            append_bm25_index,
            write_bm25_index,
        )
        from node_js_etl_processor_spark.sources.similarity_layout import (
            append_ann_layout,
            write_ann_layout,
        )

        ID_OFF = 10_000_000_000
        for name, one, ten, writer, appender, key in (
            ("bm25_append_fixed_batch", docs1, docs10, write_bm25_index,
             append_bm25_index, "doc_id"),
            ("ann_append_fixed_batch", emb1, emb10, write_ann_layout,
             append_ann_layout, "vec_id"),
        ):
            res = {}
            for scale, base in (("1x", one), (f"{args.replicas}x", ten)):
                spath = os.path.join(tmp, f"{name}_{scale}")
                writer(base, spath)
                ts = []
                for j in (1, 2):
                    batch = one.filter(F.col(key) % 20 == 0).withColumn(
                        key, F.col(key) + F.lit(j * ID_OFF)
                    )
                    t0 = time.perf_counter()
                    appender(batch, spath)
                    ts.append(time.perf_counter() - t0)
                res[f"sec_{scale}"] = round(statistics.median(ts), 3)
            res["ratio"] = (
                round(res[f"sec_{args.replicas}x"] / res["sec_1x"], 2)
                if res["sec_1x"] > 0
                else None
            )
            results[name] = res
            print(f"[{name}] {res}", file=sys.stderr)

        # ---- skew demo: source-keyed shuffle, 50% of rows on one key ----
        uniform = per_task_rows(docs10, ["source"])
        hot = per_task_rows(docsk, ["source"])
        salted = per_task_rows(
            docsk.withColumn("_salt", _salt(F.col("doc_id"), 8)), ["source", "_salt"]
        )

        def task_stats(parts: list[int]) -> dict:
            """max/mean over ALL task slots (empty slots are idle tasks —
            the wasted parallelism IS the skew cost) + the hot task's share
            of total rows (what fraction of the stage one task processes)."""
            mean = sum(parts) / len(parts)
            return {
                "max_rows": max(parts),
                "max_over_mean": round(max(parts) / mean, 2),
                "max_share": round(max(parts) / sum(parts), 3),
            }

        # equivalence on the skewed corpus: salted_count == plain groupBy
        plain = {r["source"]: r["n"] for r in
                 docsk.groupBy("source").agg(F.count("*").cast("bigint").alias("n")).collect()}
        salted_res = {r["source"]: r["n"] for r in
                      salted_count(docsk, "source", "doc_id", 8).collect()}
        assert plain == salted_res, "salted_count must equal plain groupBy count"

        skew = {
            "uniform": task_stats(uniform),
            "hot": task_stats(hot),
            "hot_salted": task_stats(salted),
            "salted_count_equals_plain": True,
        }
        print(f"[skew] uniform={skew['uniform']} hot={skew['hot']} "
              f"salted={skew['hot_salted']}", file=sys.stderr)

    print(json.dumps({
        "replicas": args.replicas,
        "runs": args.runs,
        "n_docs_1x": docs1.count(),
        "n_vecs_1x": emb1.count(),
        "only": args.only,
        "queries": results,
        "ivfpq_scan": scan,
        "skew": skew,
    }, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
