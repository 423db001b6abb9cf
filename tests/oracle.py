"""Local replica of the driver's differential gate: run a registered
query on Spark and its oracle SQL on DuckDB over the same parquet,
compare row count, column names, and order-insensitive values.

This mirrors the reference's differential scheme (DPU vs native Arrow,
/root/reference/host/filter/filter_test.cc:24-31) so mismatches are
caught locally before the driver's verify pass."""

from __future__ import annotations

import math
import os
from decimal import Decimal

import duckdb

from dpu_olap_spark.sources.tables import TABLES


def _canon(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def _rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    # key=repr: rows may hold None / mixed types that don't compare directly
    return sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows), key=repr
    ), [colnames[i] for i in order]


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cur.fetchall(), cols


def assert_query_matches_oracle(spark, query, sf_dir: str):
    sdf = query.build(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    orows, ocols = run_oracle(query.oracle, sf_dir)

    sset, scols_sorted = _rows_to_multiset(srows, scols)
    oset, ocols_sorted = _rows_to_multiset(orows, ocols)

    assert [c.lower() for c in scols_sorted] == [c.lower() for c in ocols_sorted], (
        f"{query.name}: column mismatch spark={scols_sorted} duckdb={ocols_sorted}"
    )
    assert len(sset) == len(oset), (
        f"{query.name}: row count mismatch spark={len(sset)} duckdb={len(oset)}"
    )
    if sset != oset:
        diffs = [
            (s, o) for s, o in zip(sset, oset) if s != o
        ][:5]
        raise AssertionError(
            f"{query.name}: value mismatch; first differing rows (spark, duckdb): {diffs}"
        )
