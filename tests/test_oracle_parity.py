"""Differential tests: every declared query vs its DuckDB oracle.

Mimics the driver's correctness gate (SURVEY.md §5.1): row count,
column names, and an order-insensitive value comparison at sf0.001
(the driver runs sf0.01; the logic is scale-free).
"""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def _normalize_cell(v):
    # stringified so heterogeneous cells (None vs float) stay hashable
    # and comparable, like the driver's value-hash normalization
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 6))
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return repr([_normalize_cell(x) for x in v])
    return repr(v)


def _frame_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(_normalize_cell(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, sf_dir, duck, name):
    sdf = QUERIES[name](spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    sm = _frame_to_multiset(spark_cols, spark_rows)
    dm = _frame_to_multiset(duck_cols, duck_rows)
    if sm != dm:
        only_s = [k for k in sm if sm[k] != dm.get(k, 0)][:5]
        only_d = [k for k in dm if dm[k] != sm.get(k, 0)][:5]
        raise AssertionError(
            f"{name}: value mismatch\n spark-only: {only_s}\n duck-only: {only_d}"
        )


def test_every_query_is_oracle_paired():
    # since r3 the contract has no rows-only queries: anything declared
    # in queries() must carry a DuckDB oracle (and nothing dangles)
    assert set(QUERIES) == set(ORACLES)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
