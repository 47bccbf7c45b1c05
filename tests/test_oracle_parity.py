"""The driver's correctness gate, replicated EXACTLY: every
``queries()`` entry with an ``oracle_sql()`` twin must match DuckDB
row-for-row (order-insensitive, columns sorted by name, floats by
full-precision repr) at sf0.01 — the driver's SF, not the smaller
sf0.001, because rounding-boundary hits scale with group count (a
nation_trade_volume half-cent flip was invisible at sf0.001 and 14
rows wide at sf0.01). The smoke test keeps sf0.001 for speed."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_MED, SF_SMALL
from tests.oracle_check import compare, duck_con

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_MED)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity(spark, con, name):
    assert name in QUERIES, f"oracle {name} has no queries() entry"
    df = QUERIES[name](spark, SF_MED)
    compare(df, con, ORACLES[name], name=name)


@pytest.mark.full
def test_all_queries_run(spark):
    """Every queries() entry (incl. oracle-less) executes and returns a
    stable schema with >= 0 rows. FULL tier (257s measured): the gate
    tier runs test_all_queries_construct below instead, plus the parity
    subset which EXECUTES ~130 of these exactly."""
    for name, fn in QUERIES.items():
        df = fn(spark, SF_SMALL)
        assert df.columns, name
        df.count()


def test_all_queries_construct(spark):
    """Gate-tier breadth smoke: every queries() entry ANALYZES — the
    DataFrame builds and resolves a non-empty schema at sf0.001. Catches
    the common break class (analysis errors, bad column refs, API
    regressions) for all 405 queries in under a minute; execution
    coverage comes from the parity subset + the driver's own drive."""
    for name, fn in QUERIES.items():
        df = fn(spark, SF_SMALL)
        assert df.columns, name
        df.schema  # forces full analysis


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
