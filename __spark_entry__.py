"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join rollup at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 plus
the extension tracks; ``oracle_sql()`` gives the DuckDB-equivalent SQL
for each — including the iterative connected-components op (closed by
a recursive CTE), BFS (ditto), SimHash (generated bit-vote SQL), and
Z-order (generated shift/mask SQL). The 8 rows-only entries are
exactly the ops whose internals are engine-specific by design: the
k-means IVF and PQ quantizers, HLL/t-digest sketches and the
mergeable-HLL rollup, seeded Bernoulli sampling (its deterministic
hash-bucket and priority-sampling twins ARE oracled), the mapInPandas
media decode, the PCA eigensolve (its covariance input IS oracled),
and catalog introspection — each has an accuracy/behavior test
instead (COVERAGE.md).

Implementations live in ``aiports_data_warehouse_etl_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aiports_data_warehouse_etl_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["j2_star_join_agg"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (same column names/types)."""
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
