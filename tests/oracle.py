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
    """LENIENT canon (Decimal->float, round-9): diagnostic only — the
    driver's hash proved stricter than this in round 2 (three sink
    queries passed here but hash-failed there), so the gate itself now
    uses _canon_strict and this survives only to label failures as
    representation-only vs value divergence."""
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
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def _canon_strict(v):
    """Raw-type equality: exact floats, exact decimals. The only
    rewrites are ones that preserve the value bit-for-bit while making
    equal values sort identically across engines: Decimal.normalize()
    (1.50 and 1.5 are the same exact number with different reprs),
    -0.0 -> 0.0, NaN -> sentinel (NaN != NaN), bytes -> hex,
    containers -> sorted/ordered tuples."""
    if v is None:
        return None
    if isinstance(v, Decimal):
        return v.normalize()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0
        return v
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_strict(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple)):
        return tuple(_canon_strict(x) for x in v)
    return v


def _rows_to_multiset(rows, colnames, canon=None):
    canon = canon or _canon_strict
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    # key=repr: rows may hold None / mixed types that don't compare directly
    return sorted(
        (tuple(canon(r[i]) for i in order) for r in rows), key=repr
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
    """STRICT differential gate (raw-type equality). When strict
    comparison fails but the lenient canon agrees, the error says so —
    that pattern is exactly a representation-only divergence the
    driver's hash can also see (round 2's three sink failures)."""
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
        lenient_s, _ = _rows_to_multiset(srows, scols, canon=_canon)
        lenient_o, _ = _rows_to_multiset(orows, ocols, canon=_canon)
        kind = (
            "REPRESENTATION-ONLY (lenient canon agrees: fix types/casts, "
            "values are fine)"
            if lenient_s == lenient_o
            else "VALUE divergence"
        )
        diffs = [(s, o) for s, o in zip(sset, oset) if s != o][:5]
        raise AssertionError(
            f"{query.name}: {kind}; first differing rows (spark, duckdb): {diffs}"
        )
