"""Scalar / row-level function kit used by the pipeline stages."""
