"""The correctness gate, locally: every queries() entry vs its DuckDB
oracle at sf0.001 by default — set SPARK_GRAFT_ORACLE_SF_DIR to run
the identical sweep at the driver's scale instead
(``SPARK_GRAFT_ORACLE_SF_DIR=/root/testdata/sf0.01 pytest
tests/test_queries_oracle.py``), which catches scale-sensitive hash
divergence (the agg_corr float-fold class) before the driver does
(VERDICT r6 #7)."""

from __future__ import annotations

import os

import pytest

from aiports_data_warehouse_etl_spark.queries import QUERIES
from tests.oracle import compare_query, duckdb_con


@pytest.fixture(scope="module")
def oracle_sf_dir(sf_small):
    return os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", sf_small)


@pytest.fixture(scope="module")
def con(oracle_sf_dir):
    c = duckdb_con(oracle_sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, oracle_sf_dir, con, name):
    spec = QUERIES[name]
    df = spec.fn(spark, oracle_sf_dir)
    if spec.oracle is None:
        # rows-only check, mirroring the driver's weaker gate
        assert df.count() >= 0
        return
    problems = compare_query(df, con, spec.oracle)
    assert not problems, f"{name}: " + "; ".join(problems[:8])
