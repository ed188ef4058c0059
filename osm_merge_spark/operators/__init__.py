"""Relational + spatial operators, each a DataFrame→DataFrame transformation.

Operator numbering in docstrings refers to SURVEY.md §2 (which cites the
reference implementation in /root/reference file:line).
"""
