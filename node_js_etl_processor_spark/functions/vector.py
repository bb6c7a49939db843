"""Vector math over ``array<float>`` columns — JVM-side, no UDFs.

Built from ``zip_with`` / ``aggregate`` higher-order functions so the
expressions run inside codegen and survive on 100 TB embedding tables
without Python serialization. A vectorized pandas_udf path exists in
operators/similarity.py for wide batch scoring where NumPy BLAS wins.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; null/zero-norm safe (returns null)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def normalize(a: Column) -> Column:
    """L2-normalize an array<float> column (pre-normalizing embeddings
    once at ingest turns cosine into a plain dot product at query time —
    the right trade at 100 TB where vectors are read many times)."""
    n = l2_norm(a)
    return F.when(n > 0, F.transform(a, lambda v: v / n))
