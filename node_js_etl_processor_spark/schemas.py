"""Explicit schemas for the universities data model (SURVEY.md §1.2).

The reference consumes schemaless JSON and imposes a de-facto fixed
9-key output shape (reference server.js:79-91, README.md:196-208). The
engine is schema-explicit: inference never runs in the core.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Raw API row shape (reference README.md:183-192; note the kebab-case
#: ``state-province`` key, renamed by the transform at server.js:82).
UNIVERSITIES_RAW_SCHEMA = StructType(
    [
        StructField("name", StringType(), True),
        StructField("country", StringType(), True),
        StructField("state-province", StringType(), True),
        StructField("alpha_two_code", StringType(), True),
        StructField("domains", ArrayType(StringType(), True), True),
        StructField("web_pages", ArrayType(StringType(), True), True),
    ]
)

#: Transformed shape (reference server.js:79-91). Timestamps are real
#: TimestampType in the engine (the reference stores ISO strings;
#: formatting happens at sinks — SURVEY.md §1.3).
UNIVERSITIES_SCHEMA = StructType(
    [
        StructField("name", StringType(), False),
        StructField("country", StringType(), False),
        StructField("state_province", StringType(), True),
        StructField("alpha_two_code", StringType(), True),
        StructField("domains", ArrayType(StringType(), False), False),
        StructField("web_pages", ArrayType(StringType(), False), False),
        StructField("primary_domain", StringType(), True),
        StructField("primary_website", StringType(), True),
        StructField("last_updated", TimestampType(), False),
    ]
)

#: CSV export columns, fixed order (reference server.js:109-117).
CSV_EXPORT_COLUMNS = (
    "name",
    "country",
    "state_province",
    "alpha_two_code",
    "primary_domain",
    "primary_website",
    "last_updated",
)
