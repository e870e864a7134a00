"""Self-validating correctness gate: every registry query with an oracle is
executed on Spark AND DuckDB at sf0.001 and must match exactly (post-
rounding). This is the same comparison the driver performs at sf0.01."""

from __future__ import annotations

import pytest

from solar_data_tools_spark.registry import QUERIES
from tests.oracle_utils import compare, duckdb_run

WITH_ORACLE = [n for n, s in QUERIES.items() if s.oracle is not None]


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_small, name):
    spec = QUERIES[name]
    spark_df = spec.fn(spark, sf_small)
    oracle = duckdb_run(spec.oracle, sf_small)
    compare(spark_df, oracle, name)


# Rows-only (no-oracle) queries are checked by per-query semantic
# invariants in tests/test_semantic_invariants.py.
