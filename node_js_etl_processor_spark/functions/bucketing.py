"""The ONE hash-bucket expression every bucketed store layout uses.

Stored layouts (BM25 term buckets, SCD2 key buckets, edge-store src
buckets) and their probes must compute the IDENTICAL expression or
partition pruning silently reads the wrong directories — so it lives
in exactly one place.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash_bucket(col: "Column | str", n: int) -> Column:
    """``pmod(xxhash64(col), n)`` as an int — the storage bucket of a
    key. xxhash64 is type-sensitive: pass the column at its STORED
    type (an int literal and a bigint column hash differently)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(n)).cast("int")
