"""Shared utilities: fixtures, timing, normalization."""
