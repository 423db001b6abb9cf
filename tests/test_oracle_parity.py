"""Differential gate: every registered query with an oracle must match
DuckDB on the same parquet — the local twin of the driver's
CORRECTNESS check. Queries without oracles are smoke-checked
(runs, returns a stable schema, >= 0 rows)."""

from __future__ import annotations

import pytest

from dpu_olap_spark.registry import all_queries
from tests.oracle import assert_query_matches_oracle

_QUERIES = all_queries()
_WITH_ORACLE = sorted(n for n, q in _QUERIES.items() if q.oracle)
_NO_ORACLE = sorted(n for n, q in _QUERIES.items() if not q.oracle)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, _QUERIES[name], sf_dir)


@pytest.mark.parametrize("name", _NO_ORACLE)
def test_runs_without_oracle(spark, sf_dir, name):
    df = _QUERIES[name].build(spark, sf_dir)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0
