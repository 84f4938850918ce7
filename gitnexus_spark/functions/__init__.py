"""Scalar/vectorized function library (pass-1 extractor, text analysis, ids)."""
