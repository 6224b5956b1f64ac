"""Scalar/crypto helper functions that are not Spark plans."""
