"""Fast smoke for every registered query at sf0.001 (>0 rows, stable
schema) plus the driver entry contract. The full DuckDB oracle compare
runs via tools/selfcheck.py at sf0.01."""

import pytest

from tests.conftest import SF_SMALL


def _query_names():
    from gasket_spark.queries import QUERIES

    return sorted(QUERIES)


@pytest.mark.parametrize("name", _query_names())
def test_query_runs(spark, name):
    from gasket_spark.queries import QUERIES

    df = QUERIES[name](spark, SF_SMALL)
    assert len(df.columns) > 0
    assert df.limit(1).count() >= 0  # executes the plan


def test_entry_contract(spark):
    import __spark_entry__ as em

    df = em.entry(spark)
    assert df.count() > 0
    qs, oracles = em.queries(), em.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 15
