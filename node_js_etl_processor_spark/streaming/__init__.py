"""Structured Streaming surface: scheduled refresh, windowed aggs, sessions."""
