"""Deterministic fixtures: repo-content table + binlog change stream.

Everything here is a pure function of the driver-provided
``documents.parquet`` table (seed-stable), so DuckDB oracle SQL can
recompute the same results closed-form. No wall-clock, no randomness.
"""
