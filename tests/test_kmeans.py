"""K-means training loop + Arrow-kernel parity (similarity module).

The Lloyd-step hot path runs as a fused mapInPandas kernel
(`_kmeans_partials_numpy`); the pure-Column form
(`_kmeans_partials_jvm`) is the bit-for-bit reference these tests pin
it against. `kmeans_train` is the driver loop whose output plugs into
`semdedup`/`ivf_assign` as a trained quantizer.
"""

from __future__ import annotations

import math

import pytest

from node_js_etl_processor_spark.catalog import load_table
from node_js_etl_processor_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_kmeans_arrow_kernel_equals_jvm(embeddings):
    """The fused Arrow kernel must be bit-for-bit identical to the
    pure-Column reference: same cells, same counts, and EXACT equality
    on every quantized int64 sum (the cumsum-ordered dots make even the
    assignment argmax tie-stable across the two implementations)."""
    cents = sim._ivf_centroids(8)
    jvm = {
        r["cell"]: tuple(r)
        for r in sim._kmeans_partials_jvm(embeddings, cents).collect()
    }
    npk = {
        r["cell"]: tuple(r)
        for r in sim._kmeans_partials_numpy(embeddings, cents).collect()
    }
    assert jvm.keys() == npk.keys()
    for cell in jvm:
        assert jvm[cell] == npk[cell], f"cell {cell} partials differ"


def test_kmeans_step_kernel_flag_equivalent(embeddings):
    """The declared step (Arrow kernel) equals the pure-Column step
    row-for-row, shift included."""
    fast = [tuple(r) for r in sim.kmeans_step(embeddings).collect()]
    ref = [tuple(r) for r in sim.kmeans_step(embeddings, use_arrow_kernel=False).collect()]
    assert fast == ref


def test_kmeans_train_converges_and_improves(embeddings):
    """The driver loop must terminate, return k full-dimension
    centroids, and actually descend: a step from the TRAINED centroids
    must shift less than the first step from the seeds."""
    cents = sim.kmeans_train(embeddings, n_cells=8, max_iters=5, tol=1e-4)
    assert len(cents) == 8 and all(len(c) == sim.DIM for c in cents)
    assert all(all(math.isfinite(v) for v in c) for c in cents)
    seed_shift = max(
        r["shift"] for r in sim.kmeans_step(embeddings).collect()
    )
    trained_shift = max(
        r["shift"] for r in sim.kmeans_step(embeddings, centroids=cents).collect()
    )
    assert trained_shift < seed_shift


def test_semdedup_accepts_trained_centroids(embeddings):
    """The production path — semdedup over a kmeans_train quantizer —
    must run end-to-end, keep the declared schema, only emit pairs at
    or above threshold, and be deterministic across invocations."""
    cents = sim.kmeans_train(embeddings, n_cells=8, max_iters=3, tol=1e-4)
    out = sim.semdedup(embeddings, threshold=0.2, centroids=cents)
    rows = out.collect()
    assert out.columns == ["vec_id", "cell", "dup_of", "cosine"]
    assert all(r["cosine"] >= 0.2 for r in rows)
    assert all(r["dup_of"] < r["vec_id"] for r in rows)
    again = sim.semdedup(embeddings, threshold=0.2, centroids=cents).collect()
    assert rows == again


def test_semdedup_auto_sizes_cells(embeddings):
    """With neither centroids nor n_cells, semdedup must auto-size the
    cell count to ~sqrt(n) — the guard that keeps within-cell pair
    generation off the quadratic cliff at scale."""
    n = embeddings.count()
    expected_cells = max(8, math.isqrt(max(n - 1, 0)) + 1)
    out = sim.semdedup(embeddings, threshold=0.2)
    cells = [r["cell"] for r in out.select("cell").distinct().collect()]
    assert all(0 <= c < expected_cells for c in cells)
    # the declared fixed-8 form must find at least as many dups as the
    # finer auto-sized blocking (coarser cells => superset of pairs)
    fixed = sim.semdedup(embeddings, threshold=0.2, n_cells=8).count()
    assert out.count() <= fixed


def test_trained_centroids_thread_through_ivf_and_layout(
    spark, sf_dir, embeddings, tmp_path
):
    """A trained quantizer must produce IDENTICAL results via the
    on-the-fly path and the materialized layout path (write with
    centroids → probe with the same centroids), and a mismatched
    probe/layout centroid set is the caller's bug the docstrings warn
    about — here we only pin the matched path."""
    from node_js_etl_processor_spark.operators.similarity import (
        _probe_vector,
        ivf_topk,
    )
    from node_js_etl_processor_spark.sources.similarity_layout import (
        ivf_probe,
        write_ann_layout,
    )

    cents = sim.kmeans_train(embeddings, n_cells=8, max_iters=3, tol=1e-4)
    path = str(tmp_path / "sim_trained")
    write_ann_layout(embeddings, path, centroids=cents)
    probe = _probe_vector(embeddings, 0)

    got = [
        tuple(r)
        for r in ivf_probe(
            spark, path, probe, k=10, exclude_vec_id=0, centroids=cents
        ).collect()
    ]
    want = [
        tuple(r)
        for r in ivf_topk(
            embeddings, probe, k=10, exclude_vec_id=0, centroids=cents
        ).collect()
    ]
    assert got == want and len(got) == 10


def test_kmeans_train_on_sample(embeddings):
    """Sampled training (the 100 TB pattern) must converge to a usable
    quantizer: full-dim finite centroids whose one-step shift from the
    FULL corpus is below the seeds' shift (the sample estimates the
    same means)."""
    cents = sim.kmeans_train(
        embeddings, n_cells=8, max_iters=3, tol=1e-4, sample_fraction=0.5
    )
    assert len(cents) == 8 and all(len(c) == sim.DIM for c in cents)
    seed_shift = max(r["shift"] for r in sim.kmeans_step(embeddings).collect())
    sampled_shift = max(
        r["shift"] for r in sim.kmeans_step(embeddings, centroids=cents).collect()
    )
    assert sampled_shift < seed_shift


def test_pq_train_reduces_quantization_error(spark, sf_dir):
    """Trained PQ codebooks must reconstruct the corpus better than
    the deterministic seeds (lower total squared quantization error),
    and must thread through pq_encode end-to-end."""
    import numpy as np

    from node_js_etl_processor_spark.catalog import load_table
    from node_js_etl_processor_spark.operators.similarity import (
        PQ_SUB_DIM,
        _pq_codebooks,
        pq_encode,
        pq_train,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    seeds = _pq_codebooks()
    trained = pq_train(emb, max_iters=5)

    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}

    def total_sqerr(cbs):
        codes = {r["vec_id"]: list(r["codes"])
                 for r in pq_encode(emb, codebooks=cbs).collect()}
        err = 0.0
        for vid, v in vecs.items():
            recon = np.concatenate([np.asarray(cbs[s][j])
                                    for s, j in enumerate(codes[vid])])
            err += float(((v - recon) ** 2).sum())
        return err

    e_seed, e_trained = total_sqerr(seeds), total_sqerr(trained)
    assert e_trained < e_seed
    # every trained codebook keeps the right geometry
    assert len(trained) == 8 and all(
        len(cb) == 16 and all(len(c) == PQ_SUB_DIM for c in cb) for cb in trained
    )


def test_pq_encode_kernels_bit_identical(spark, sf_dir):
    """The Arrow PQ-encode kernel must be BIT-IDENTICAL to the
    pure-Column reference form on the fixture — same codes, same
    packed values — for both the deterministic seed codebooks and a
    trained set (the kmeans-kernel parity discipline applied to
    encoding)."""
    from node_js_etl_processor_spark.catalog import load_table
    from node_js_etl_processor_spark.operators.similarity import (
        pq_encode,
        pq_train,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    for cbs in (None, pq_train(emb, max_iters=2)):
        a = sorted(
            (r["vec_id"], tuple(r["codes"]), r["pq_code"])
            for r in pq_encode(emb, codebooks=cbs, use_arrow_kernel=True).collect()
        )
        b = sorted(
            (r["vec_id"], tuple(r["codes"]), r["pq_code"])
            for r in pq_encode(emb, codebooks=cbs, use_arrow_kernel=False).collect()
        )
        assert a == b and len(a) > 0
