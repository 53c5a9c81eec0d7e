"""Functions: column expressions + the numpy model library."""
