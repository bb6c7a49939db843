"""Mergeable sketch operators — the approximate-counting tier.

The reference has no sketches (its only aggregate is an array
``length``, server.js:249); this module belongs to the mandated
large-pipeline surface next to ``q_approx_distinct``'s HLL: a
Count-Min sketch (Cormode & Muthukrishnan, "An improved data stream
summary: the count-min sketch and its applications", J. Algorithms
2005) built entirely from DataFrame aggregations.

Scale shape: the sketch IS the point — a d×w counter grid (here 4×64
= 256 cells) summarizes any number of items, partial-aggregates
map-side, and MERGES by cell-wise addition across partitions, days,
or datacenters. Estimation never rescans the stream: probes join the
broadcast counter grid. Hashes are the md5-derived portable family
(operators.dedup.portable_hash64's trick), so a DuckDB oracle rebuilds
the grid bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: Grid geometry: 4 hash rows × 64 columns. ε ≈ e/w ≈ 4.2% of the
#: stream mass per estimate, δ ≈ e^-d ≈ 1.8% failure rate — sized so
#: the fixture (thousands of keys) actually collides and the
#: over-estimate behavior is exercised, not hidden.
CMS_DEPTH = 4
CMS_WIDTH = 64


def _cms_col(key: Column, row: int, width: int) -> Column:
    """Column index of ``key`` in hash row ``row``: low 32 bits of
    md5(row || '|' || key) mod width — engine-neutral (DuckDB:
    ('0x' || substr(md5(...), 9, 8))::UBIGINT % width)."""
    hx = F.md5(F.concat(F.lit(str(row)), F.lit("|"), key))
    return F.pmod(
        F.conv(F.substring(hx, 9, 8), 16, 10).cast("bigint"), F.lit(width)
    ).cast("bigint")


def countmin_build(
    items: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the (row, col, c) counter grid: one explode to d rows per
    item, ONE keyed aggregation with map-side partials. The output is
    d×w rows regardless of stream size — the mergeable summary."""
    key = F.col(key_col).cast("string")
    cells = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row"),
                        _cms_col(key, r, width).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell")
    ).select("cell.row", "cell.col")
    return cells.groupBy("row", "col").agg(
        F.count("*").cast("bigint").alias("c")
    )


def countmin_estimate(
    probes: DataFrame,
    counters: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point estimates for ``probes``: min over the d probed cells.
    The counter grid is d×w rows — broadcast; the probe never rescans
    the stream."""
    key = F.col(key_col).cast("string")
    probed = probes.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row"),
                        _cms_col(key, r, width).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(key_col, "cell.row", "cell.col")
    return (
        probed.join(F.broadcast(counters), ["row", "col"])
        .groupBy(key_col)
        .agg(F.min("c").cast("bigint").alias("cms_est"))
    )


def q_countmin(orders: DataFrame) -> DataFrame:
    """Declared query (r8): Count-Min over the o_custkey stream —
    build the 4×64 grid, estimate every distinct key, and report the
    estimate against the exact count (the CM guarantee exact ≤ est is
    a tested invariant; the overshoot column makes collision behavior
    visible). Fully oracle-checked: DuckDB rebuilds the same grid from
    the same md5-derived hashes and replays the min-of-cells
    estimate."""
    counters = countmin_build(orders, "o_custkey")
    probes = orders.select("o_custkey").distinct()
    est = countmin_estimate(probes, counters, "o_custkey")
    exact = orders.groupBy("o_custkey").agg(
        F.count("*").cast("bigint").alias("exact_n")
    )
    return exact.join(est, "o_custkey").select(
        "o_custkey",
        "exact_n",
        "cms_est",
        (F.col("cms_est") - F.col("exact_n")).cast("bigint").alias("overshoot"),
    )


#: Bloom geometry: 4 hashes into 2^17 bits. At the sf0.01 fixture's
#: ~10k stored keys the load is kn/m ≈ 0.3 → ~0.5% false-positive
#: rate — small enough to be a real filter, large enough that false
#: positives actually appear in the declared query's output.
BLOOM_K = 4
BLOOM_M = 131072


def _bloom_bit(key: Column, i: int, m: int) -> Column:
    """Bit position of hash ``i`` — same md5-derived family as the
    count-min columns (DuckDB-replayable)."""
    hx = F.md5(F.concat(F.lit(f"b{i}"), F.lit("|"), key))
    return F.pmod(
        F.conv(F.substring(hx, 9, 8), 16, 10).cast("bigint"), F.lit(m)
    ).cast("bigint")


def bloom_build(
    items: DataFrame, key_col: str, k: int = BLOOM_K, m: int = BLOOM_M
) -> DataFrame:
    """The set-bit table (bit BIGINT, ≤ m rows): one explode to k bits
    per item + DISTINCT — the row form of the bitmap (at scale the
    same positions OR into an m-bit array; row form keeps the store
    joinable and the oracle trivial). Merges across batches by UNION
    DISTINCT — the Bloom property."""
    key = F.col(key_col).cast("string")
    return (
        items.select(
            F.explode(
                F.array(*[_bloom_bit(key, i, m) for i in range(k)])
            ).alias("bit")
        )
        .distinct()
    )


def bloom_probe(
    probes: DataFrame,
    bits: DataFrame,
    key_col: str,
    k: int = BLOOM_K,
    m: int = BLOOM_M,
) -> DataFrame:
    """Membership probe: maybe_present ⇔ ALL k bit positions set. No
    false negatives ever (the Bloom guarantee — test-pinned); false
    positives at the designed rate. The bit table joins broadcast
    (≤ m rows of one bigint)."""
    key = F.col(key_col).cast("string")
    pb = probes.select(
        key_col,
        F.explode(
            F.array(*[_bloom_bit(key, i, m) for i in range(k)])
        ).alias("bit"),
    )
    hits = (
        pb.join(F.broadcast(bits.withColumn("_set", F.lit(1))), "bit", "left")
        .groupBy(key_col)
        .agg((F.count("_set") == F.lit(k)).alias("maybe_present"))
    )
    return hits


def q_bloom(orders: DataFrame) -> DataFrame:
    """Declared query (r8): Bloom-filter membership — build the
    set-bit table over the o_orderkey % 3 != 0 slice (the 'accepted'
    set), probe EVERY order key, and report the filter's verdict next
    to true membership. The no-false-negative guarantee and the
    visible false-positive band are both in the output (is_fp), and
    the DuckDB oracle rebuilds the same bits and replays the
    all-k-bits-set probe."""
    stored = orders.filter(F.col("o_orderkey") % 3 != 0)
    bits = bloom_build(stored, "o_orderkey")
    probes = orders.select("o_orderkey").distinct()
    verdicts = bloom_probe(probes, bits, "o_orderkey")
    return verdicts.select(
        "o_orderkey",
        (F.col("o_orderkey") % 3 != 0).alias("actually_stored"),
        "maybe_present",
        (F.col("maybe_present") & (F.col("o_orderkey") % 3 == 0)).alias("is_fp"),
    )


def countmin_read_store(spark: SparkSession, store_path: str) -> DataFrame:
    """Resolve a ``countmin_ingest_stream`` store to its CURRENT grid
    (r10 — the store is versioned: ``v_<tag>`` directories plus an
    atomically-switched ``_CURRENT`` pointer, which is what makes the
    merge loop exactly-once). Readers always resolve the pointer at
    read time; a missing pointer means no batch ever committed."""
    import posixpath

    from ..streaming.markers import current_version

    cur = current_version(store_path)
    if cur is None:
        raise ValueError(
            f"no committed Count-Min grid at {store_path!r} (missing "
            "_CURRENT pointer) — run countmin_ingest_stream first"
        )
    return spark.read.parquet(posixpath.join(store_path, cur))
