#!/usr/bin/env python
"""Heavy-family core-scaling at a 10x (~sf1) corpus — r21, VERDICT
r20 item 6.

The driver's 8-vs-32-core block at sf0.1 is overhead-bound (0.1-3 s
queries; ratios 0.35-2.95 against a 4x core ratio), so it cannot
falsify any §2/§4 parallelism claim. This script builds the ~sf1
corpus (scale_stress.py's replica multiplier, duplicate structure
linear by construction) ONCE into tmp parquet, then times the heavy
families in TWO SEPARATE Spark sessions — local[8] and local[32] —
and reports sec_8c / sec_32c per query. A ratio well above 1 means
the operator actually parallelizes once there is enough work per
core; a ratio near 1 at this size would be a real serial bottleneck.

Usage: python scripts/core_scaling.py [--replicas 10] [--runs 2]
Writes one JSON document to stdout; BENCH.md records the table.
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(df_fn, runs: int) -> float:
    df_fn().write.format("noop").mode("overwrite").save()  # warm
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df_fn().write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--cores", nargs="+", type=int, default=[8, 32])
    args = ap.parse_args()

    from scale_stress import multiply_documents, multiply_embeddings

    from node_js_etl_processor_spark.session import get_spark

    # ---- build the 10x corpus once (32 cores; untimed) ----
    spark = get_spark(app_name="core_scaling_build", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    docs1 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb1 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    tmp = tempfile.mkdtemp(prefix="core_scaling_")
    docs_path = os.path.join(tmp, "documents_big")
    emb_path = os.path.join(tmp, "embeddings_big")
    multiply_documents(docs1, args.replicas).repartition(32).write.parquet(docs_path)
    multiply_embeddings(emb1, args.replicas).repartition(32).write.parquet(emb_path)
    spark.stop()

    # ---- the heavy families the r20 verdict asked to re-measure:
    # Python-decode media, dedup, setsim, LM — plus the Arrow kmeans
    # kernel. Each entry is (name, lambda(spark) -> DataFrame).
    def families(spark):
        from node_js_etl_processor_spark.operators import (
            dedup,
            setsim,
            similarity,
            text,
        )
        from node_js_etl_processor_spark.operators.flac import q_audio_flac
        from node_js_etl_processor_spark.operators.multimodal import (
            q_audio_features,
            q_video_frames,
        )

        docs = spark.read.parquet(docs_path)
        emb = spark.read.parquet(emb_path)
        return {
            "q_video_frames": lambda: q_video_frames(docs),
            "q_audio_flac": lambda: q_audio_flac(docs),
            "q_audio_features": lambda: q_audio_features(docs),
            "q_dedup_minhash": lambda: dedup.q_dedup_minhash(docs),
            "q_dedup_clusters": lambda: dedup.q_dedup_clusters(docs),
            "q_dedup_simhash": lambda: dedup.q_dedup_simhash(docs),
            "q_setsim_join": lambda: setsim.q_setsim_join(docs),
            "q_lm_perplexity": lambda: text.q_lm_perplexity(docs),
            "q_lm_bigram_perplexity": lambda: text.q_lm_bigram_perplexity(docs),
            "q_kmeans_step": lambda: similarity.q_kmeans_step(emb),
        }

    results: dict[str, dict[str, float]] = {}
    for cores in args.cores:
        spark = get_spark(app_name=f"core_scaling_{cores}", master=f"local[{cores}]")
        spark.sparkContext.setLogLevel("ERROR")
        for name, fn in families(spark).items():
            spark.sparkContext.setJobDescription(f"core_scaling {name} @{cores}c")
            results.setdefault(name, {})[f"sec_{cores}c"] = timed(fn, args.runs)
        spark.stop()

    lo, hi = min(args.cores), max(args.cores)
    for name, r in results.items():
        if f"sec_{lo}c" in r and f"sec_{hi}c" in r and r[f"sec_{hi}c"] > 0:
            r["speedup"] = round(r[f"sec_{lo}c"] / r[f"sec_{hi}c"], 2)
    print(
        json.dumps(
            {
                "replicas": args.replicas,
                "runs_per_query": args.runs,
                "cores": args.cores,
                "corpus": {"documents": docs_path, "embeddings": emb_path},
                "queries": results,
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
