"""Scheduled-refresh semantics as Structured Streaming availableNow.

The reference reruns its whole ETL daily via cron (O3, reference
server.js:264-269). The engine's streaming twin treats the staged raw
data as a file stream: each ``trigger(availableNow=True)`` run
processes exactly the files that arrived since the last checkpoint,
then stops — incremental refresh with exactly-once file tracking,
instead of the reference's full recompute.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from node_js_etl_processor_spark.schemas import UNIVERSITIES_RAW_SCHEMA
from node_js_etl_processor_spark.universities import transform_universities


def file_stream_refresh(
    spark: SparkSession,
    source_dir: str,
    output_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Incrementally transform newly-landed raw JSONL files into the
    staged parquet output. Returns the (availableNow, self-stopping)
    query; callers ``awaitTermination()``."""
    raw = (
        spark.readStream.schema(UNIVERSITIES_RAW_SCHEMA)
        .json(source_dir)  # JSONL landing zone
    )
    transformed = transform_universities(raw)
    return (
        transformed.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
