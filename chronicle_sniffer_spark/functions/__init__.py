"""Scalar/aggregate function helpers: timestamps, text analysis, UDF
parity demos (SURVEY §2B U-series, P6-P8 helpers, L4 text ops)."""
