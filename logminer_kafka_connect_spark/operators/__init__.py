"""Relational operators of the CDC engine + training-data ops."""
