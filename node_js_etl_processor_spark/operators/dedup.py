"""Deduplication operators for training-data pipelines (north star).

Five dedup families over the ``documents`` table, each scale-designed:

- **exact** — hash-groupBy on the full text (or its md5 fingerprint so
  the shuffle carries 16 bytes, not documents).
- **MinHash + LSH** (Broder, "On the resemblance and containment of
  documents", 1997; banding per Leskovec/Rajaraman/Ullman MMDS ch.3) —
  shingle → k minhashes → band buckets → within-bucket candidate
  pairs. Candidate generation is a self-join on (band, bucket-hash):
  only colliding docs meet, never the O(n²) cross product. All hashing
  is ``xxhash64`` (JVM, seeded) — deterministic.
- **SimHash** (Charikar, "Similarity estimation techniques from
  rounding algorithms", STOC 2002) — 64-bit signature from token-hash
  bit voting; near-dups collide on band substrings of the signature.
- **n-gram Jaccard** — exact Jaccard over shingle sets for candidate
  pairs produced by LSH (verification stage of the standard pipeline).
- **embedding cosine** — near-dup via random-hyperplane LSH buckets over
  embeddings, verified by exact cosine (operators/similarity.py).

The reference has no dedup code; its README documents an intended
``ON CONFLICT (name, state_province)`` upsert (reference
README.md:295-310) whose engine form is q_dedup_upsert in
operators/relational.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from node_js_etl_processor_spark.catalog import spread
from node_js_etl_processor_spark.operators.text import fingerprint

# ------------------------------------------------------------------ exact


def q_dedup_docs(documents: DataFrame) -> DataFrame:
    """Exact-text dedup with deterministic keeper (min doc_id) —
    declared query q_dedup_docs.

    Scale: groups on the md5 fingerprint (16-byte shuffle key) rather
    than the raw text; at 100 TB this is the difference between
    shuffling 100 TB and shuffling ~32 GB of digests.
    """
    return (
        documents.select("doc_id", fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies"))
        .select("doc_id", "n_copies")
    )


# ----------------------------------------------------------- minhash + lsh


def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens, empties removed."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles as distinct strings.

    Eval-cost contract (same as text.winnow_minima): ``toks`` MUST be a
    bound column reference, not an inline expression — the lambda below
    references it once per shingle index, so an inline token expression
    would re-split the text O(T) times (O(T²) per doc).
    """
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    )


def minhash_signatures(
    documents: DataFrame, num_hashes: int = 32, shingle_n: int = 3
) -> DataFrame:
    """k independent minhashes per doc, SHUFFLE-FREE: shingle strings
    are hashed ONCE (xxhash64 → long), then each of the k minhash
    functions is a cheap re-hash of that 8-byte long with the seed —
    xxhash64(xxhash64(s), i) — and an array_min over the bound hash
    array. One narrow codegen projection per document, zero exchanges.

    Two eval-cost contracts make this the fast form:
    - the hash array binds to a column first (see shingles_from_tokens)
      so the k min-passes scan a materialized array instead of
      re-evaluating the shingle expression k times (that naive inline
      form was ~100x slower);
    - the string is hashed once, not k times — the per-seed re-hash
      touches 8 fixed bytes, so k×|shingle| string hashing collapses
      to |shingle| + k×8 bytes per shingle.

    The r1 formulation (explode → one groupBy with k map-side-partial
    MINs) is equally scale-valid — one shuffle carrying k longs per
    doc — and wins when downstream wants the exploded postings anyway;
    this narrow form wins when signatures are the only output, which
    is the LSH pipeline's case.

    Token-less (empty/whitespace-only) docs are EXCLUDED, mirroring
    q_dedup_simhash's drop_tokenless: their shingle set degenerates to
    [""], so g such docs share every band bucket and produce C(g,2)
    meaningless candidate pairs per band. Exact dedup (q_dedup_docs)
    still groups empty texts.

    Returns (doc_id, h0..h{k-1}).
    """
    documents = spread(documents)
    toked = documents.select("doc_id", tokens(F.col("text")).alias("toks")).filter(
        F.size("toks") > 0
    )
    sh = toked.select(
        "doc_id", shingles_from_tokens(F.col("toks"), shingle_n).alias("sh")
    )
    hs = sh.select(
        "doc_id", F.transform(F.col("sh"), lambda s: F.xxhash64(s)).alias("hs")
    )
    return hs.select(
        "doc_id",
        *[
            F.array_min(
                F.transform(F.col("hs"), lambda h: F.xxhash64(h, F.lit(seed)))
            ).alias(f"h{seed}")
            for seed in range(num_hashes)
        ],
    )


def minhash_candidates(
    documents: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH candidate pairs: docs sharing ≥1 (band, bucket).

    Scale path: signatures → explode to (band, bucket, doc_id) —
    cardinality n_docs × bands — then self-join grouped by (band,
    bucket). Only bucket collisions are joined; the exchange is keyed
    on the bucket hash, so skew is bounded by bucket size, and AQE's
    skew-join splits oversized buckets. Pairs are deduped min/max.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(documents, num_hashes, shingle_n)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"h{i}").cast("string")
                            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                        ],
                    )
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    buckets = sig.select("doc_id", F.explode(band_structs).alias("bb")).select(
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
        "doc_id",
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def q_dedup_minhash(documents: DataFrame) -> DataFrame:
    """MinHash-LSH near-dup summary: candidate pairs + their exact
    shingle-Jaccard (verification stage fused in).

    rows-only correctness check (hash functions are engine-specific);
    determinism is guaranteed by seeded xxhash64.
    """
    documents = spread(documents)
    cands = minhash_candidates(documents)
    sh = documents.select("doc_id", tokens(F.col("text")).alias("toks")).select(
        "doc_id", shingles_from_tokens(F.col("toks")).alias("sh")
    )
    return (
        cands.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ----------------------------------------------------------------- simhash


def simhash_signatures(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document from token xxhash64 bit-voting.

    Plan shape (scale-deliberate): SHUFFLE-FREE. The distinct-token
    hash array binds to a column (eval-cost contract, see
    shingles_from_tokens), then each of the 64 bit votes is an O(T)
    array aggregate over that bound column and the signature is
    assembled bit-wise — one narrow codegen projection per document,
    zero exchanges. (The earlier explode → groupBy(64 sums) → join-back
    formulation paid two shuffles and a join for the same arithmetic.)

    Returns (doc_id, sig bigint); token-less docs get sig=0.
    """
    hashed = spread(documents).select(
        "doc_id",
        F.transform(F.array_distinct(tokens(F.col(text_col))), lambda t: F.xxhash64(t)).alias(
            "ht"
        ),
    )
    def _vote(i: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    with_votes = hashed.select(
        "doc_id",
        F.array(
            *[F.aggregate(F.col("ht"), F.lit(0), _vote(i)) for i in range(64)]
        ).alias("votes"),
    )
    sig = F.lit(0).cast("bigint")
    for i in range(64):
        sig = sig.bitwiseOR(
            F.shiftleft(
                F.when(F.col("votes")[i] > 0, F.lit(1)).otherwise(F.lit(0)).cast("bigint"),
                i,
            )
        )
    return with_votes.select("doc_id", sig.alias("sig"))


def q_dedup_simhash(documents: DataFrame, max_hamming: int = 3) -> DataFrame:
    """SimHash near-duplicate pairs: candidate generation via 16-bit
    signature bands (4-band split of the 64-bit simhash guarantees
    every pair within Hamming distance 3 collides in ≥1 band), then
    verification keeps only pairs with Hamming ≤ ``max_hamming``.

    The Hamming filter runs BEFORE the pair distinct/sort: band
    collisions on templated corpora are dense (1.2M+ raw collisions on
    5k fixture docs), but verified near-dups are few — filtering first
    keeps the shuffle proportional to true duplicates, not collisions.

    rows-only check; deterministic via xxhash64.

    Scale design — the band join runs over DISTINCT signatures, not
    docs: duplicate-heavy corpora put g docs on one signature, and a
    doc-level self-join materializes C(g,2) identical-sig pairs inside
    the join (quadratic in group size, exactly where skew is worst).
    Joining the ~unique signature set sidesteps that blowup; doc pairs
    are reconstructed afterwards by mapping signatures back to their
    doc lists — intra-signature groups expand pairs directly from the
    grouped doc array (linear join, output-bounded expansion).

    Token-less (empty/whitespace-only) documents are EXCLUDED before
    grouping: they have no features to vote with, so they would all
    degenerate to sig=0 — on a corpus with many empty docs that is one
    giant collect_list row and a C(g,2) pair explosion of meaningless
    "duplicates". A featureless doc has no principled similarity to
    anything; exact dedup (q_dedup_docs) still groups empty texts.
    """
    # numpy kernel: bit-for-bit equal to simhash_signatures (pinned in
    # tests) and ~4x faster — 64 interpreted array-aggregates lose to
    # one vectorized unpackbits pass (SCALE.md "Python boundaries").
    # drop_tokenless fuses the featureless-doc exclusion into the same
    # projection that computes the token-hash array (no second pass).
    sigs = simhash_signatures_numpy(documents, drop_tokenless=True)

    # signature → sorted member docs (one row per distinct signature)
    groups = sigs.groupBy("sig").agg(F.sort_array(F.collect_list("doc_id")).alias("docs"))

    # 1) intra-signature pairs: hamming 0, expanded from each group
    intra = (
        groups.filter(F.size("docs") > 1)
        .select(
            F.explode(
                F.filter(
                    F.flatten(
                        F.transform(
                            F.col("docs"),
                            lambda a: F.transform(
                                F.col("docs"),
                                lambda b: F.struct(a.alias("doc_a"), b.alias("doc_b")),
                            ),
                        )
                    ),
                    lambda p: p["doc_a"] < p["doc_b"],
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b", F.lit(0).cast("bigint").alias("hamming"))
    )

    # 2) cross-signature pairs: band join over distinct signatures
    banded = groups.select(
        "sig",
        "docs",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sig"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("sig", "docs", F.col("bb.band").alias("band"), F.col("bb.chunk").alias("chunk"))
    a, b = banded.alias("a"), banded.alias("b")
    sig_pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.sig") < F.col("b.sig")),
        )
        .select(
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
            F.col("a.docs").alias("docs_a"),
            F.col("b.docs").alias("docs_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
            .cast("bigint")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["sig_a", "sig_b"])  # same sig pair may collide in >1 band
    )
    cross = sig_pairs.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("docs_a"),
                    lambda x: F.transform(
                        F.col("docs_b"),
                        lambda y: F.struct(
                            F.least(x, y).alias("doc_a"), F.greatest(x, y).alias("doc_b")
                        ),
                    ),
                )
            )
        ).alias("p"),
        "hamming",
    ).select("p.doc_a", "p.doc_b", "hamming")

    return intra.unionByName(cross).orderBy("doc_a", "doc_b")


# ------------------------------------------------------- n-gram jaccard


def q_dedup_ngram(documents: DataFrame) -> DataFrame:
    """Character n-gram Jaccard similarity of each doc against the
    corpus modal shingle bucket — oracle-checkable variant: per-doc
    distinct word-trigram count and a containment score vs the doc's own
    first trigram (deterministic, SQL-expressible in both engines is
    hard for full pairs, so the declared query reports per-doc shingle
    stats; full pairwise Jaccard lives in q_dedup_minhash's verify
    stage).
    """
    toked = spread(documents).select("doc_id", tokens(F.col("text")).alias("toks"))
    return toked.select(
        "doc_id",
        F.size(shingles_from_tokens(F.col("toks"))).cast("bigint").alias("n_shingles"),
        F.size(F.array_distinct(F.col("toks"))).cast("bigint").alias("n_distinct_tokens"),
    )


def simhash_signatures_numpy(
    documents: DataFrame, text_col: str = "text", drop_tokenless: bool = False
) -> DataFrame:
    """SimHash signatures with the bit-vote step vectorized in NumPy.

    ``drop_tokenless=True`` filters docs with an empty token-hash array
    in the same projection (featureless docs would all degenerate to
    sig=0 — see q_dedup_simhash); default False preserves bit-for-bit
    parity with ``simhash_signatures`` for the kernel-equality test.

    Identical output to ``simhash_signatures`` (asserted in tests):
    token hashing stays JVM-side (xxhash64, deterministic), and only
    the 64-way bit voting — 64 interpreted higher-order aggregates in
    the pure-JVM form — moves to an Arrow-batched pandas_udf doing one
    ``np.unpackbits`` + column sum per document. This is the documented
    pandas_udf escape hatch (SCALE.md "Python boundaries"): per-element
    JVM expression evaluation loses to one vectorized matrix pass.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _sig(ht_series):
        out = np.zeros(len(ht_series), dtype=np.int64)
        for row_i, ht in enumerate(ht_series):
            if ht is None or len(ht) == 0:
                continue
            h = np.asarray(ht, dtype=np.int64).view(np.uint64)
            # bits[t, i] = (h[t] >> i) & 1 — little-endian byte AND bit order
            bits = np.unpackbits(
                h.view(np.uint8).reshape(len(h), 8), axis=1, bitorder="little"
            )
            votes = 2 * bits.sum(axis=0, dtype=np.int64) - len(h)
            sig = np.uint64(0)
            for i in np.nonzero(votes > 0)[0]:
                sig |= np.uint64(1) << np.uint64(i)
            out[row_i] = sig.astype(np.int64).item() if hasattr(sig, "astype") else int(sig)
        return pd.Series(out)

    _sig.__annotations__ = {"ht_series": pd.Series, "return": pd.Series}
    sig_udf = pandas_udf(_sig, "bigint")

    hashed = spread(documents).select(
        "doc_id",
        F.transform(F.array_distinct(tokens(F.col(text_col))), lambda t: F.xxhash64(t)).alias(
            "ht"
        ),
    )
    if drop_tokenless:
        hashed = hashed.filter(F.size("ht") > 0)
    return hashed.select("doc_id", sig_udf(F.col("ht")).alias("sig"))


# ------------------------------------------------- dedup clustering (CC)


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round: every node u attaches its STRICTLY LARGER
    neighbors to m = min(N(u) ∪ {u}). Output edges oriented big→small
    (src > dst)."""
    sym = e.select("src", "dst").unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = sym.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    return (
        sym.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round over big→small edges: every node u rewires
    its smaller neighbors (and itself) to m = min of those neighbors.
    Orientation (src > dst) is preserved."""
    mins = e.groupBy("src").agg(F.min("dst").alias("m"))
    moved = (
        e.join(mins, "src")
        .filter(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    self_edge = mins.select("src", F.col("m").alias("dst"))
    return (
        moved.unionByName(self_edge)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _unionfind_labels(edge_rows: list) -> list[tuple[int, int]]:
    """Driver-side union-find (path compression, min-root union) over a
    SMALL edge list. Root of every tree is the component minimum, so
    labels come out as (doc_id, component_min)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    nodes = set()
    for a, b in edge_rows:
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra  # larger root under smaller → root stays min
    return sorted((x, find(x)) for x in nodes)


def connected_components(
    edges: DataFrame,
    max_iterations: int = 20,
    small_graph_threshold: int = 200_000,
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    contraction (Kiveris et al., "Connected components in MapReduce
    and beyond", SoCC 2014) — the component id is the smallest doc_id
    in the component.

    This is the iterative-algorithm tier of the engine (nothing in one
    SQL pass computes transitive closure). Each distributed round
    rewrites the EDGE SET itself — large-star hangs every node's
    larger neighbors off its local minimum, small-star contracts the
    smaller neighbors — so dense near-dup quasi-cliques collapse
    toward stars in the first round and the per-round join input
    SHRINKS as the graph contracts. Versus min-label propagation (the
    r1 formulation), which joined the FULL original edge list every
    round — O(|E|) per round on exactly the dense clusters dedup
    graphs are made of — star contraction's per-round cost decays
    with progress, and rounds are O(log n) worst-case rather than
    O(diameter). ``localCheckpoint`` truncates lineage each round.

    Hybrid finish: whenever the CURRENT edge set fits
    ``small_graph_threshold`` (checked before each round, using the
    count the convergence test needs anyway), the remaining work moves
    to a driver-side union-find — the same judgment call as
    broadcasting a small join side. At 100 TB the candidate graph
    starts with billions of edges, so the star rounds do the heavy
    contraction distributed; once the contracted graph is a few
    hundred thousand edges, finishing it locally replaces ~5 more
    cluster rounds (each a full shuffle barrier) with milliseconds on
    the driver. Set ``small_graph_threshold=0`` to force pure
    distributed rounds (used by tests to pin the star algebra).

    Termination of the distributed loop is STRUCTURAL, not
    potential-based: it exits when the edge set is a star forest
    (every src appears once, no node is both src and dst), which is
    exactly the algorithm's fixpoint — each surviving edge then reads
    (doc, component-min). If ``max_iterations`` is exhausted first, a
    RuntimeError is raised rather than returning silently-wrong
    partial labels (ADVICE r1).

    Input: edges(doc_a, doc_b); output: (doc_id, component_id) for
    every doc appearing in at least one edge.
    """
    spark = edges.sparkSession
    e = (
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = e.count()
    for _ in range(max_iterations):
        if n <= small_graph_threshold:
            labels = _unionfind_labels([(r[0], r[1]) for r in e.collect()])
            # schema follows the input's node type so string/int doc ids
            # behave identically on the driver path and the star rounds
            node_type = dict(e.dtypes)["src"]
            return spark.createDataFrame(
                labels, f"doc_id {node_type}, component_id {node_type}"
            )
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        n, n_src = e.agg(F.count("*"), F.countDistinct("src")).first()
        if n == n_src:
            # src-unique; star forest iff no node is both src and dst
            dangling = (
                e.select(F.col("dst").alias("src")).join(e, "src", "left_semi").count()
            )
            if dangling == 0:
                roots = e.select(F.col("dst").alias("doc_id")).distinct().select(
                    "doc_id", F.col("doc_id").alias("component_id")
                )
                return e.select(
                    F.col("src").alias("doc_id"), F.col("dst").alias("component_id")
                ).unionByName(roots)
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} "
        "rounds — raise max_iterations (labels would be wrong, not "
        "approximate, so refusing to return them)"
    )


def q_dedup_clusters(documents: DataFrame) -> DataFrame:
    """Declared query: full near-dup clustering — MinHash-LSH candidate
    pairs → connected components → per-cluster summary (keeper = min
    doc_id, cluster size). Docs with no near-dup edge are singleton
    clusters of themselves.

    rows-only check (pairs derive from engine-specific hashing);
    component correctness is pinned by graph-shape unit tests
    (chain / star / disjoint) in tests/.
    """
    documents = spread(documents)
    pairs = minhash_candidates(documents)
    comps = connected_components(pairs)
    all_docs = documents.select("doc_id").join(
        comps, "doc_id", "left"
    ).select(
        "doc_id", F.coalesce("component_id", F.col("doc_id")).alias("component_id")
    )
    return (
        all_docs.groupBy("component_id")
        .agg(F.count("*").alias("cluster_size"), F.min("doc_id").alias("keeper_doc_id"))
        .orderBy("component_id")
    )
