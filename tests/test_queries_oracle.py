"""The correctness gate, locally: every queries() entry vs its DuckDB
oracle at sf0.001 (the driver runs the same compare at sf0.01)."""

from __future__ import annotations

import pytest

from aiports_data_warehouse_etl_spark.queries import QUERIES
from tests.oracle import compare_query, duckdb_con


@pytest.fixture(scope="module")
def con(sf_small):
    c = duckdb_con(sf_small)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_small, con, name):
    spec = QUERIES[name]
    df = spec.fn(spark, sf_small)
    if spec.oracle is None:
        # rows-only check, mirroring the driver's weaker gate
        assert df.count() >= 0
        return
    problems = compare_query(df, con, spec.oracle)
    assert not problems, f"{name}: " + "; ".join(problems[:8])
