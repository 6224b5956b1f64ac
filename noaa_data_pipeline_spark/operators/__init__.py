"""Reusable DataFrame operator implementations.

Modules here hold the engine-level building blocks (tokenization,
shingling, minhash, simhash, vector math, weather rollups); the
``plans`` package wires them to the oracle-checked query surface.
"""
