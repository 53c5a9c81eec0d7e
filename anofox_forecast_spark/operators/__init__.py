"""Operators: table-level transformations (SURVEY.md §2)."""
