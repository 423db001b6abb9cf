"""Gate coverage for tools/fuzz_seams.py itself: every shape family
generates parseable SQL. The campaigns (cross-engine execution over
thousands of seeds) run out-of-gate as a tool; this test only guards
the generators against bitrot — each family's SQL must at least BIND
on DuckDB (names, types, syntax), which catches a renamed column,
a typo'd function, or a broken f-string without paying Spark startup.
"""

from __future__ import annotations

import sys
import os
import random

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from tests.oracle import _connect

SF = "/root/testdata/sf0.001"


def test_every_shape_family_generates_bindable_sql():
    import fuzz_seams as fz

    con = _connect(SF)
    try:
        for shape, gen in sorted(fz._SHAPES.items()):
            for seed in (1, 2, 3):
                rng = random.Random(seed)
                sql = gen(con, rng)
                assert isinstance(sql, str) and "SELECT" in sql, (shape, sql)
                # bind + execute on DuckDB only: validates every
                # identifier, function, and literal the generator emits
                cur = con.execute(sql)
                cols = [d[0] for d in cur.description]
                assert cols, (shape, sql)
                cur.fetchall()
    finally:
        con.close()


def test_default_mix_covers_every_family():
    import fuzz_seams as fz

    assert set(fz._DEFAULT_MIX) == set(fz._SHAPES), (
        "a shape family is registered but missing from the default mix "
        "(or vice versa) — campaigns would silently skip it"
    )
