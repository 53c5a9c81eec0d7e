"""Driver-contract test: every queries() entry with an oracle_sql() entry must
match DuckDB on the sf0.001 tables (the driver runs the same at sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR, compare_frames

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR)
    ddf = duck.execute(ORACLES[name]).df()
    compare_frames(sdf, ddf)


def test_no_rows_only_queries():
    # Since round 5 every queries() entry has an exact DuckDB oracle; this
    # guards against backsliding into weaker rows-only verification.
    assert set(QUERIES) == set(ORACLES)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
