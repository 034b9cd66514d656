"""Scalar / per-row function surface: type ladder, parsing, extraction."""
