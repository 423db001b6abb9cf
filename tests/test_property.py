"""Property-based differential testing (hypothesis): for ARBITRARY
filter thresholds and group moduli, Spark and DuckDB agree on the
fixed testdata. Complements the seeded-random tests with adversarial
parameter search (shrinking finds minimal failing thresholds)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

PATH = "/root/testdata/sf0.001/lineitem.parquet"

_spark = None


@pytest.fixture(autouse=True)
def _capture_spark(spark):
    global _spark
    _spark = spark
    yield


@settings(max_examples=8, deadline=None)
@given(threshold=st.floats(min_value=0.5, max_value=55.0, allow_nan=False))
def test_filter_count_matches_any_threshold(threshold):
    got = (
        _spark.read.parquet(PATH).where(F.col("l_quantity") < threshold).count()
    )
    exp = duckdb.sql(
        f"SELECT COUNT(*) FROM '{PATH}' WHERE l_quantity < {threshold!r}"
    ).fetchall()[0][0]
    assert got == exp


@settings(max_examples=8, deadline=None)
@given(mod=st.integers(min_value=1, max_value=97))
def test_group_count_matches_any_modulus(mod):
    got = sorted(
        (r.g, r.n)
        for r in _spark.read.parquet(PATH)
        .groupBy((F.col("l_orderkey") % mod).alias("g"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    exp = sorted(
        duckdb.sql(
            f"SELECT l_orderkey % {mod} AS g, COUNT(*) FROM '{PATH}' GROUP BY g"
        ).fetchall()
    )
    assert got == exp
