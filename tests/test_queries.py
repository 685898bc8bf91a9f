"""Every catalog query hash-matches its DuckDB oracle at sf0.001 —
the same comparison the driver runs at sf0.01 (tools/check_oracle.py
runs that scale locally)."""

import pytest

import __spark_entry__ as entrymod
from hematite_spark.oracle import compare, duck_connection
from tests.conftest import SF_DIR

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


def test_catalog_is_consistent():
    # every oracle key must have a query; queries without oracle are
    # allowed (rows-only check) but should be rare
    assert set(ORACLES) <= set(QUERIES)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_DIR)
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only check
        return
    mismatch = compare(df, duck, ORACLES[name])
    assert mismatch is None, f"{name}: {mismatch}"
