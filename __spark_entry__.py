"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``dpu_olap_spark`` package; this module
only adapts the registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dpu_olap_spark import session as _session
from dpu_olap_spark import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (filter + 4-way join + grouped agg: revenue per
    nation) on /root/testdata/sf0.001; driver checks rows>0."""
    _session.tune(spark)
    flagship = _registry.get_query("join_agg")
    return flagship.build(spark, "/root/testdata/sf0.001")


def _wrap(build: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _session.tune(spark)
        return build(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(q.build) for name, q in _registry.all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each verifiable query."""
    return _registry.oracle_map()
