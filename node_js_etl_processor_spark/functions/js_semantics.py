"""JavaScript-truthiness semantics as Catalyst column expressions.

The reference pipeline (reference server.js:65-97) filters and cleans
rows with JS truthiness rules, which differ from SQL three-valued logic
in ways that are semantic, not incidental (SURVEY.md §2a F1/F2/P3):

- ``null``/missing and ``''`` are both falsy, but ``'   '``
  (whitespace-only) is truthy — it survives the pre-filter, is trimmed
  to ``''``, and must then be dropped by the *post*-trim re-filter
  (reference server.js:69-76 vs :93). The two-phase filter is
  order-sensitive and must not be folded.
- the ternary clean ``x ? String(x).trim() : null`` maps ``''`` input
  to ``null`` but whitespace-only input to ``''`` (server.js:82-83).

Every helper is a pure Column function — built-in expressions only, so
the whole chain stays inside WholeStageCodegen and Catalyst can push the
resulting predicates into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def js_truthy_str(c: Column) -> Column:
    """JS truthiness for a string column: non-null AND non-empty.

    Whitespace-only strings are truthy (reference server.js:71-72).
    """
    return c.isNotNull() & (c != F.lit(""))


def clean_str(c: Column) -> Column:
    """``String(x).trim()`` for a required field (reference server.js:80-81)."""
    return F.trim(c.cast("string"))


def trim_or_null(c: Column) -> Column:
    """``x ? String(x).trim() : null`` (reference server.js:82-83).

    ``''`` → null; ``'  '`` → ``''`` (truthy pre-trim); null → null.
    """
    return F.when(js_truthy_str(c), F.trim(c.cast("string"))).otherwise(F.lit(None).cast("string"))


def clean_str_array(c: Column) -> Column:
    """Per-element trim with non-array → ``[]`` (reference server.js:84-85).

    Deliberate divergence from JS (documented in SURVEY.md §2a P4):
    ``String(null)`` in JS yields the literal ``"null"``; the engine uses
    sane cast semantics (null element → null element).
    """
    return F.coalesce(
        F.transform(c, lambda d: F.trim(d.cast("string"))),
        F.array().cast("array<string>"),
    )


def first_element_or_null(c: Column) -> Column:
    """``arr.length > 0 ? String(arr[0]).trim() : null`` (server.js:86-89).

    ``element_at(..., 1)`` returns null for empty arrays under non-ANSI
    element_at semantics; wrapped with try_element_at for ANSI safety.
    """
    return F.trim(F.try_element_at(c, F.lit(1)).cast("string"))


def null_to_empty(c: Column) -> Column:
    """CSV-boundary coalesce ``x || ''`` (reference server.js:122-126)."""
    return F.coalesce(c.cast("string"), F.lit(""))
