"""Plan-level helpers: partitioning hints, explain utilities (SURVEY.md §4)."""
