"""Filled in incrementally — see queries/__init__.py registry."""

QUERIES = {}
