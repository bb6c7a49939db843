"""Sources & sinks: HTTP JSON APIs, JSON/CSV/parquet files."""
