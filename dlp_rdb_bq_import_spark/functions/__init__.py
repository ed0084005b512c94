"""Scalar/row-shaping/tokenization function library."""
