"""Perceptual-hash image near-dup (r13): difference hash (dHash) over
REAL decoded rasters, and the declared q_image_dedup family.

dHash (the standard perceptual-hash folklore construction, e.g.
Krawetz's published description): downscale to a 9×8 luminance grid
(nearest-neighbor — ``multimodal.resize_raster``'s documented
convention), then each of the 64 bits records whether brightness
rises between horizontal neighbors. The hash is invariant to global
brightness shifts and to any monotone per-pixel scaling — which is
exactly what makes it a NEAR-dup key: re-encoded, brightness-shifted
or contrast-scaled copies of an image collide, while structurally
different images do not.

This extends the dedup family (exact fp / minhash / simhash /
embedding / SemDeDup) to the image modality THROUGH the real
decoders: payloads are decoded (netpbm here; any raster decoder in
the engine feeds the same kernel), resized and hashed inside one
Arrow pass, and the near-dup grouping is a plain groupBy on the
64-bit key — at 100 TB the same shape as exact text dedup (16-byte
shuffle keys, never pixels).

Oracle form: the synth patterns are integer sawtooth rasters whose
decoded pixels — and therefore every dHash bit — are closed-form in
doc_id, so DuckDB recomputes the hash per document from the same
integer arithmetic (including the nearest-neighbor sampling indices)
and replays the grouping. Planted near-dup trios share a pattern but
differ in brightness and amplitude, pinning the invariance claim
under the oracle gate, not just in unit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType
from pyspark.sql.window import Window

#: synth geometry: 18×16 source rasters downscale 2× onto the 9×8
#: dHash grid, so the resize path is exercised, not bypassed
PHASH_W, PHASH_H = 18, 16

DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("ok", StringType(), False),
        StructField("dhash", StringType(), True),
    ]
)


def dhash_hex(pixels: "object") -> str:
    """64-bit dHash of a gray (H, W) or color (H, W, 3) raster as 16
    hex chars: mean-to-gray, nearest-neighbor resize to 9×8, bit
    (y, x) = grid[y, x+1] > grid[y, x], packed row-major MSB-first
    (np.packbits order — the byte layout the SQL oracle rebuilds)."""
    import numpy as np

    from node_js_etl_processor_spark.operators.multimodal import resize_raster

    arr = np.asarray(pixels)
    if arr.ndim == 3:
        arr = arr.astype(np.int64).sum(axis=2) // arr.shape[2]
    grid = resize_raster(arr.astype(np.int64), 9, 8)
    bits = (grid[:, 1:] > grid[:, :-1]).astype(np.uint8)
    return np.packbits(bits.reshape(-1)).tobytes().hex()


def synth_phash_media(documents: DataFrame) -> DataFrame:
    """Deterministic P5 grayscale rasters with PLANTED near-dup trios:
    docs sharing a pattern group g = doc_id // 3 draw the same integer
    sawtooth (px = c + amp where ((a·x + b·y) mod p)·2 < p, else c)
    with per-member brightness c = 10·(doc_id%3) and amplitude
    amp = 120 + 25·(doc_id%3) — dHash compares neighbors, so members
    collide by construction while distinct patterns (a = 1 + g%5,
    b = g%4, p = 3 + g%6) generally do not. Every doc_id%11==0 row
    carries a REAL TIFF payload instead — foreign-format rejection
    under the gate. Values stay ≤ 255, so the SQL oracle recomputes
    pixels with plain integer arithmetic (no wraparound cases)."""
    import numpy as np

    from node_js_etl_processor_spark.operators.media_harness import (
        per_doc,
        synth_media,
    )
    from node_js_etl_processor_spark.operators.netpbm import encode_netpbm
    from node_js_etl_processor_spark.operators.tiff import encode_tiff

    def make_row(did: int):
        if did % 11 == 0:
            return "image/tiff", encode_tiff(
                np.zeros((4, 5), dtype=np.uint8), "II"
            )
        g = did // 3
        a, b, p = 1 + g % 5, g % 4, 3 + g % 6
        c = 10 * (did % 3)
        amp = 120 + 25 * (did % 3)
        y, x = np.mgrid[0:PHASH_H, 0:PHASH_W]
        high = ((a * x + b * y) % p) * 2 < p
        px = (c + np.where(high, amp, 0)).astype(np.uint8)
        return "image/x-portable-graymap", encode_netpbm(px, "P5")

    return synth_media(documents, per_doc(make_row), "image")


def image_dhash(media: DataFrame) -> DataFrame:
    """Decode → resize → dHash in one Arrow pass (netpbm payloads;
    foreign/corrupt rows isolate as ok=false)."""
    from node_js_etl_processor_spark.operators.media_harness import (
        media_features,
    )
    from node_js_etl_processor_spark.operators.netpbm import decode_netpbm

    def extract(payload):
        arr, _magic, _maxval = decode_netpbm(payload)
        return [{"dhash": dhash_hex(arr)}]

    return media_features(media, DHASH_SCHEMA, extract)


def image_near_dup_groups(hashed: DataFrame) -> DataFrame:
    """Near-dup grouping over the 64-bit keys: per ok row, the hash
    group's size and min-media_id keeper (the text exact-dedup keeper
    rule, applied to a perceptual key). Rejected rows pass through as
    ok=false with NULL group columns. One 8-byte-key exchange."""
    ok = hashed.filter(F.col("ok") == "true")
    w = Window.partitionBy("dhash")
    grouped = ok.select(
        "media_id",
        "ok",
        "dhash",
        F.count("*").over(w).cast("bigint").alias("n_same"),
        F.min("media_id").over(w).cast("bigint").alias("keeper"),
    ).withColumn(
        "is_dup",
        F.when(F.col("media_id") != F.col("keeper"), "true").otherwise("false"),
    )
    rejected = hashed.filter(F.col("ok") != "true").select(
        "media_id",
        "ok",
        "dhash",
        F.lit(None).cast("bigint").alias("n_same"),
        F.lit(None).cast("bigint").alias("keeper"),
        F.lit(None).cast("string").alias("is_dup"),
    )
    return grouped.unionByName(rejected)


def q_image_dedup(documents: DataFrame) -> DataFrame:
    """r13 declared query: the full image near-dup loop —
    ``synth_phash_media`` (real P5 encode of closed-form sawtooth
    rasters with planted brightness/contrast-shifted trios) →
    ``image_dhash`` (real decode + resize + dHash) →
    ``image_near_dup_groups``. The DuckDB oracle recomputes every
    dHash bit from the pattern arithmetic (same nearest-neighbor
    indices, same row-major MSB-first packing) and replays the
    grouping, so decode, resize, hashing, packing, invariance AND the
    keeper rule are all cross-checked.

    Scale: one Arrow decode pass (zero shuffles) + one 8-byte-key
    window exchange — the exact-text-dedup shape on a perceptual key."""
    return image_near_dup_groups(image_dhash(synth_phash_media(documents))).orderBy(
        "media_id"
    )
