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


def test_agg_collect_raw_arrays(spark, sf_dir):
    """The raw-array list-agg variant (unregistered: the driver's
    pandas canonicalizer can't sort array cells) checked through the
    fetchall() path, which compares list cells exactly."""
    from dpu_olap_spark.operators.relational import (
        AGG_COLLECT_RAW_ORACLE,
        q_agg_collect_raw,
    )
    from tests.oracle import _rows_to_multiset, run_oracle

    sdf = q_agg_collect_raw(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    orows, ocols = run_oracle(AGG_COLLECT_RAW_ORACLE, sf_dir)
    sset, scs = _rows_to_multiset(srows, list(sdf.columns))
    oset, ocs = _rows_to_multiset(orows, ocols)
    assert [c.lower() for c in scs] == [c.lower() for c in ocs]
    assert sset == oset
