"""Operator library: each operator is a pure function over DataFrames."""
