"""The seam house rules as an automated registry lint (r12 verdict
item #3).

Round 12 pinned the cross-engine seams (the *_cross_engine_seam tests
in tests/test_random_differential.py) and recorded HOUSE RULES for
registered SQL (implicit-
ASC NULLS placement, bare concat over NULL, DATE+INTERVAL result
type), each previously enforced by a one-off manual registry audit.
tools/oracle_lint.py automates those audits; this module (a) runs the
lint over the FULL registry — every oracle and every builder-side SQL
string constant — inside the pytest gate, and (b) proves each rule
actually FIRES via seeded negative fixtures, so "0 offenders" can
never mean "the lint matches nothing".
"""

from __future__ import annotations

import glob
import os
import sys

import pyarrow.parquet as pq

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

from oracle_lint import (  # noqa: E402
    iter_builder_sql,
    lint_concat_null,
    lint_date_interval,
    lint_order_by_nulls,
    lint_registry,
    lint_sql,
)


def test_registry_and_builders_zero_offenders():
    """Every registered oracle and builder SQL string follows the
    three house rules — the automated form of the manual audits the
    r12 seam pins ended with."""
    offenders = lint_registry()
    assert offenders == [], "\n".join(offenders)


def test_lint_surface_actually_collects_builder_sql():
    """The ast walk must keep finding the builder-side spark.sql()
    texts — an import-path regression that silently collects nothing
    would make rule-pass vacuous."""
    found = list(iter_builder_sql())
    assert len(found) > 150, f"only {len(found)} SQL strings collected"
    files = {os.path.basename(p) for p, _, _ in found}
    # spot-check: the heaviest SQL-bearing modules are represented
    assert {"tpch_full.py", "spark4_surface.py", "relational.py"} <= files


def test_base_columns_are_null_free():
    """The lint's nullability model rests on this: no base column in
    the driver fixtures carries a NULL, so NULL can only enter through
    the constructs the lint matches (NULLIF / TRY_* / LEAD / LAG /
    CASE-without-ELSE / bare NULL literals)."""
    for f in sorted(glob.glob("/root/testdata/sf0.001/*.parquet")):
        t = pq.read_table(f)
        nully = [c for c in t.column_names if t.column(c).null_count > 0]
        assert not nully, f"{os.path.basename(f)}: NULLs in {nully}"


def test_rule_implicit_asc_nulls_fires():
    """Seeded negatives: nullable sort keys WITHOUT explicit NULLS
    placement must flag (Spark puts NULLs first under implicit ASC,
    DuckDB last — wrong ROWS through LIMIT, the r12 seam)."""
    bad = [
        "SELECT a FROM t ORDER BY NULLIF(a, 0)",
        "SELECT a FROM t ORDER BY try_divide(a, b) DESC, c",
        "SELECT rank() OVER (ORDER BY lead(a) OVER (ORDER BY b)) FROM t",
        "SELECT a FROM t ORDER BY CASE WHEN a > 0 THEN 1 END",
        "SELECT a FROM t ORDER BY IF(a > 0, a, NULL)",
    ]
    for sql in bad:
        assert lint_order_by_nulls(sql), f"rule 1 silent on: {sql}"
    good = [
        # the sanctioned spellings
        "SELECT a FROM t ORDER BY NULLIF(a, 0) NULLS LAST",
        "SELECT a FROM t ORDER BY COALESCE(NULLIF(a, 0), -1)",
        "SELECT a FROM t ORDER BY a, b DESC",  # null-free base columns
        "SELECT a FROM t ORDER BY CASE WHEN a > 0 THEN 1 ELSE 2 END",
        "SELECT sum(a) FROM t GROUP BY b ORDER BY sum(a) DESC, b",
    ]
    for sql in good:
        assert not lint_order_by_nulls(sql), f"rule 1 misfire on: {sql}"


def test_rule_concat_null_fires():
    """Seeded negatives: concat() over a null-producing argument must
    flag (Spark NULL-propagates, DuckDB skips NULL args)."""
    bad = [
        "SELECT concat(a, NULLIF(b, ''), c) FROM t",
        "SELECT concat(a, CASE WHEN x > 0 THEN b END) FROM t",
        "SELECT concat(lead(a) OVER (ORDER BY b), '-') FROM t",
    ]
    for sql in bad:
        assert lint_concat_null(sql), f"rule 2 silent on: {sql}"
    good = [
        "SELECT concat(a, COALESCE(NULLIF(b, ''), ''), c) FROM t",
        "SELECT concat(a, '-', b) FROM t",  # null-free base columns
        "SELECT concat_ws('-', a, b) FROM t",  # different fn, not the seam
    ]
    for sql in good:
        assert not lint_concat_null(sql), f"rule 2 misfire on: {sql}"


def test_rule_date_interval_fires():
    """Seeded negatives: projecting DATE +/- INTERVAL without CAST
    must flag (Spark returns DATE, DuckDB TIMESTAMP — equal instants,
    different pandas-view hashes)."""
    bad = [
        "SELECT DATE '1995-01-01' + INTERVAL 1 DAY AS d FROM t",
        "SELECT CAST(x AS DATE) + INTERVAL '1' DAY AS d FROM t",
        "SELECT to_date(s) - INTERVAL 3 MONTH AS d FROM t",
    ]
    for sql in bad:
        assert lint_date_interval(sql), f"rule 3 silent on: {sql}"
    good = [
        # the sanctioned spelling: CAST the RESULT
        "SELECT CAST(DATE '1995-01-01' + INTERVAL 1 DAY AS DATE) AS d "
        "FROM t",
        "SELECT CAST(to_date(s) - INTERVAL 3 MONTH AS TIMESTAMP) FROM t",
        # timestamp arithmetic is aligned on both engines — not flagged
        "SELECT ts + INTERVAL 1 DAY AS d FROM t",
        "SELECT o_orderdate - INTERVAL 90 DAY AS d FROM t",
    ]
    for sql in good:
        assert not lint_date_interval(sql), f"rule 3 misfire on: {sql}"


def test_lint_sql_aggregates_all_rules():
    sql = (
        "SELECT concat(a, NULLIF(b, '')) , "
        "DATE '1995-01-01' + INTERVAL 1 DAY AS d "
        "FROM t ORDER BY NULLIF(a, 0)"
    )
    hits = lint_sql(sql)
    assert len(hits) == 3, hits


def test_lint_sql_includes_date_trunc_rule():
    assert lint_sql("SELECT date_trunc('week', ts) FROM t"), (
        "rule 4 not aggregated into lint_sql"
    )


def test_rule_date_trunc_fires():
    """Seeded negatives: projecting date_trunc at DAY-or-coarser
    granularity without CAST must flag (DuckDB returns DATE, Spark
    TIMESTAMP — the r13 probe find); sub-day parts return TIMESTAMP
    on both engines and are not flagged."""
    from oracle_lint import lint_date_trunc

    bad = [
        "SELECT date_trunc('week', ts) AS wk FROM t",
        "SELECT date_trunc('month', o_orderdate) AS m FROM orders",
        "SELECT date_trunc('YEAR', ts) FROM t",
    ]
    for sql in bad:
        assert lint_date_trunc(sql), f"rule 4 silent on: {sql}"
    good = [
        "SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk FROM t",
        "SELECT CAST(date_trunc('month', MIN(ts)) AS TIMESTAMP) FROM t",
        # sub-day parts are aligned on both engines
        "SELECT date_trunc('hour', ts) AS h FROM t",
        "SELECT date_trunc('milliseconds', ts) FROM t",
    ]
    for sql in good:
        assert not lint_date_trunc(sql), f"rule 4 misfire on: {sql}"


def test_rule_regex_portability_fires():
    """Seeded negatives: lookaround, backslash sequences, and $N
    replacement refs in shared regexp_* calls must flag (Java regex
    vs RE2 + string-literal escaping — the r13 probe finds; all three
    diverge SILENTLY)."""
    from oracle_lint import lint_regex_portability

    bad = [
        r"SELECT regexp_extract(s, 'a(?=b)', 0) FROM t",
        r"SELECT regexp_extract(s, '\\d+', 0) FROM t",
        r"SELECT regexp_replace(s, '([a-z]+)', '$1!') FROM t",
        r"SELECT regexp_like(s, 'x(?!y)') FROM t",
    ]
    for sql in bad:
        assert lint_regex_portability(sql), f"rule 5 silent on: {sql}"
    good = [
        # the house style: bracket classes, plain anchors, no refs
        "SELECT regexp_extract(s, '([a-z]+)', 1) FROM t",
        "SELECT regexp_extract(s, '^[0-9]+$', 0) FROM t",
        "SELECT regexp_replace(s, '[0-9]+', '#') FROM t",
    ]
    for sql in good:
        assert not lint_regex_portability(sql), f"rule 5 misfire on: {sql}"


def test_rule_like_escape_fires():
    """Seeded negatives: a backslash inside a LIKE pattern without an
    explicit ESCAPE clause must flag (Spark default-escapes with
    backslash, DuckDB has no default escape — silent row divergence,
    the r13 probe find)."""
    from oracle_lint import lint_like_escape

    bad = [
        r"SELECT * FROM t WHERE s LIKE 'a\_b'",
        r"SELECT * FROM t WHERE s LIKE '%10\%%'",
    ]
    for sql in bad:
        assert lint_like_escape(sql), f"rule 6 silent on: {sql}"
    good = [
        r"SELECT * FROM t WHERE s LIKE 'a\_b' ESCAPE '\'",
        "SELECT * FROM t WHERE s LIKE 'a_b'",
        "SELECT * FROM t WHERE s LIKE 'Brand#1%'",
    ]
    for sql in good:
        assert not lint_like_escape(sql), f"rule 6 misfire on: {sql}"


def test_rule_left_right_negative_fires():
    """Seeded negatives: left/right with a non-literal length must
    flag (negative lengths return '' in Spark, drop-from-the-other-end
    in DuckDB — the r13 probe find)."""
    from oracle_lint import lint_left_right_negative

    bad = [
        "SELECT left(s, n) FROM t",
        "SELECT right(s, length(s) - 8) FROM t",
        "SELECT left(s, -2) FROM t",
    ]
    for sql in bad:
        assert lint_left_right_negative(sql), f"rule 7 silent on: {sql}"
    good = [
        "SELECT left(s, 3), right(s, 10) FROM t",
        "SELECT a FROM t LEFT JOIN u ON t.k = u.k",  # keyword, not call
        "SELECT substr(s, 2) FROM t",  # different fn
    ]
    for sql in good:
        assert not lint_left_right_negative(sql), f"rule 7 misfire: {sql}"


def test_rule_array_agg_null_fires():
    """Seeded negatives: array_agg/list over a null-producing
    expression must flag (Spark SKIPS NULL elements, DuckDB KEEPS
    them — different element counts, the r13 probe find)."""
    from oracle_lint import lint_array_agg_null

    bad = [
        "SELECT array_agg(NULLIF(x, 0)) FROM t",
        "SELECT list(CASE WHEN x > 0 THEN x END ORDER BY x) FROM t",
        "SELECT array_agg(lead(x) OVER (ORDER BY x)) FROM t",
    ]
    for sql in bad:
        assert lint_array_agg_null(sql), f"rule 8 silent on: {sql}"
    good = [
        "SELECT array_agg(x) FROM t",  # null-free base column
        "SELECT list(o_orderkey ORDER BY o_orderkey) FROM orders",
        "SELECT array_agg(COALESCE(NULLIF(x, 0), -1)) FROM t",
    ]
    for sql in good:
        assert not lint_array_agg_null(sql), f"rule 8 misfire: {sql}"


def test_rule_fractional_cast_fires():
    """Seeded negatives: CAST of an interpolating aggregate to an
    integer type without the clearing multiply-through must flag —
    double->int CAST TRUNCATES in Spark but ROUNDS half-to-even in
    DuckDB (3.5 -> 3 vs 4, 2.9 -> 2 vs 3; the r14 probe find,
    test_double_to_bigint_cast_cross_engine_seam)."""
    from oracle_lint import lint_fractional_cast

    bad = [
        "SELECT CAST(avg(x) AS BIGINT) FROM t",  # /n never clears
        "SELECT CAST(median(x) AS BIGINT) FROM t",  # no factor
        "SELECT CAST(median(x * 3) AS BIGINT) FROM t",  # odd factor
        # p=0.25 needs a multiple-of-4 factor, *2 leaves half-steps
        "SELECT CAST(percentile(x * 2, 0.25) AS BIGINT) FROM t",
        # non-binary-exact fraction can't be cleared at all
        "SELECT CAST(percentile_cont(0.1) WITHIN GROUP (ORDER BY x * 4)"
        " AS BIGINT) FROM t",
        "SELECT CAST(quantile_cont(x, 0.5) AS INTEGER) FROM t",
    ]
    for sql in bad:
        assert lint_fractional_cast(sql), f"rule 9 silent on: {sql}"
    good = [
        # the registry's sanctioned multiply-through spellings
        "SELECT CAST(median(x * 2) AS BIGINT) FROM t",
        "SELECT CAST(percentile(c * 2, 0.5) AS BIGINT) FROM t",
        "SELECT CAST(quantile_cont(dev2 * 2, 0.5) AS BIGINT) FROM t",
        "SELECT CAST(percentile_cont(0.75) WITHIN GROUP "
        "(ORDER BY c * 4) AS BIGINT) FROM t",
        # rank-picking / extreme-p forms are integral over ints
        "SELECT CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY c) "
        "AS BIGINT) FROM t",
        "SELECT CAST(percentile(c, 1) AS BIGINT) FROM t",
        # not a fractional aggregate / not an integer target
        "SELECT CAST(sum(x) AS BIGINT) FROM t",
        "SELECT CAST(median(x) AS DOUBLE) FROM t",
        "SELECT CAST(floor(x * 100 + 0.5) AS BIGINT) FROM t",
    ]
    for sql in good:
        assert not lint_fractional_cast(sql), f"rule 9 misfire: {sql}"


def test_rule_substr_trim_fires():
    """Seeded negatives for RULE 10 (the r14 probe-sweep cluster,
    pinned in test_substr_zero_trim_order_dow_cross_engine_seam):
    substr start 0 diverges silently (Spark yields n chars, DuckDB
    n-1) and two-arg ltrim/rtrim parse with SWAPPED argument roles
    (Spark ltrim(trimStr, src) vs DuckDB ltrim(src, chars))."""
    from oracle_lint import lint_substr_trim

    bad = [
        "SELECT substr(s, 0, 3) FROM t",
        "SELECT substring(s, 0) FROM t",  # aligned today, flagged anyway
        "SELECT substring(s FROM 0 FOR 2) FROM t",  # ANSI spelling
        "SELECT ltrim(s, 'x') FROM t",
        "SELECT rtrim(concat(a, b), 'x') FROM t",
    ]
    for sql in bad:
        assert lint_substr_trim(sql), f"rule 10 silent on: {sql}"
    good = [
        # the sanctioned spellings from the seam test's aligned regimes
        "SELECT substr(s, 1, 3), substr(s, -2), substr(s, 2) FROM t",
        "SELECT substr(md5(s), 1, 15) FROM t",
        "SELECT substring(s FROM 2 FOR 3) FROM t",
        "SELECT trim(LEADING 'x' FROM s), trim(TRAILING 'x' FROM s) "
        "FROM t",
        "SELECT ltrim(s), rtrim(s) FROM t",  # 1-arg whitespace trims
        # a comma inside a quoted trim-set must not read as two args
        "SELECT ltrim(s) FROM t WHERE s LIKE 'a,b%'",
    ]
    for sql in good:
        assert not lint_substr_trim(sql), f"rule 10 misfire: {sql}"


def test_lint_sql_includes_substr_trim_rule():
    assert lint_sql("SELECT ltrim(s, 'x') FROM t"), (
        "rule 10 not aggregated into lint_sql"
    )


def test_rule_fractional_cast_factor_scoping():
    """The r14 ADVICE false-negative window: rule 9 accepted ANY
    matching integer factor anywhere inside the CAST body, so
    CAST(median(x + 2*y) AS BIGINT) passed although the *2 clears no
    half-step interpolation.  The factor search is now SCOPED to
    top-level products of the aggregate's value/order argument or of
    the whole aggregate result."""
    from oracle_lint import lint_fractional_cast

    bad = [
        # the ADVICE example: *2 buried under a top-level +
        "SELECT CAST(median(x + 2*y) AS BIGINT) FROM t",
        # factor inside a nested call scales only one branch
        "SELECT CAST(median(coalesce(x, 2*y)) AS BIGINT) FROM t",
        # top-level additive tail breaks the whole-expr scale
        "SELECT CAST(median(2*x + 1) AS BIGINT) FROM t",
        # WITHIN GROUP order expr with the factor under an additive
        "SELECT CAST(percentile_cont(0.5) WITHIN GROUP "
        "(ORDER BY x + 2*y) AS BIGINT) FROM t",
    ]
    for sql in bad:
        assert lint_fractional_cast(sql), f"scoped rule 9 silent: {sql}"
    good = [
        # whole-result multiply from outside the aggregate
        "SELECT CAST(median(x) * 2 AS BIGINT) FROM t",
        # pure top-level product inside the argument (parenthesized sum)
        "SELECT CAST(median((x + y) * 2) AS BIGINT) FROM t",
        # WITHIN GROUP order expr as a pure product, with a sort spec
        "SELECT CAST(percentile_cont(0.75) WITHIN GROUP "
        "(ORDER BY c * 4 ASC) AS BIGINT) FROM t",
    ]
    for sql in good:
        assert not lint_fractional_cast(sql), f"scoped rule 9 misfire: {sql}"


def test_rule_floor_ceil_sign_fires():
    """Seeded negatives for RULE 11 (the r15 probe find, pinned in
    test_floor_ceil_sign_result_type_cross_engine_seam): over DOUBLE
    input, floor/ceil/ceiling return BIGINT in Spark but DOUBLE in
    DuckDB, and sign() returns DOUBLE in Spark but an integer in
    DuckDB — equal values, silently diverging types.  Every use in
    shared SQL must sit inside a CAST."""
    from oracle_lint import lint_floor_ceil_sign

    bad = [
        "SELECT floor(x * 100 + 0.5) AS cents FROM t",
        "SELECT ceil(price) FROM t ORDER BY 1 LIMIT 5",
        "SELECT ceiling(x) FROM t",
        "SELECT sign(balance) AS s FROM t",
        # CAST nearby but NOT enclosing
        "SELECT CAST(x AS DOUBLE), floor(y) FROM t",
    ]
    for sql in bad:
        assert lint_floor_ceil_sign(sql), f"rule 11 silent on: {sql}"
    good = [
        # the registry's sanctioned cents spelling
        "SELECT CAST(floor(x * 100 + 0.5) AS BIGINT) AS cents FROM t",
        "SELECT CAST(ceil(price) AS BIGINT) FROM t",
        "SELECT CAST(sign(balance) AS INT) AS s FROM t",
        # enclosing CAST at an outer level still normalizes the type
        "SELECT CAST(floor(x) + floor(y) AS BIGINT) FROM t",
        "SELECT length(s) FROM t",  # different fn
    ]
    for sql in good:
        assert not lint_floor_ceil_sign(sql), f"rule 11 misfire: {sql}"


def test_lint_sql_includes_floor_ceil_sign_rule():
    assert lint_sql("SELECT floor(x) FROM t"), (
        "rule 11 not aggregated into lint_sql"
    )


def test_builder_sql_walk_excludes_docstrings():
    """Docstrings are prose, not executable SQL: a docstring QUOTING a
    seam spelling (q_pipe_sql's mentions floor(x*100+0.5)) must not
    trip rule 11, while real spark.sql() string constants stay
    linted.  Guard both directions: the walk yields NO docstring
    text, and still yields the SQL constants around it."""
    import tempfile
    from pathlib import Path

    from oracle_lint import iter_builder_sql

    src = '''
"""Module docstring with SELECT floor(x * 100 + 0.5) FROM t prose."""

def f(spark):
    """Fn docstring: SELECT ceil(y) FROM t ORDER BY 1 prose."""
    return spark.sql("SELECT o_orderkey FROM orders ORDER BY 1")
'''
    with tempfile.TemporaryDirectory() as d:
        Path(d, "mod.py").write_text(src)
        got = list(iter_builder_sql(d))
    texts = [t for _, _, t in got]
    assert any("o_orderkey" in t for t in texts), "real SQL lost"
    assert not any("prose" in t for t in texts), "docstring leaked in"


def test_rule_arg_minmax_fires():
    """Seeded negatives for RULE 12 (the r15 probe find, pinned in
    test_max_by_min_by_cross_engine_seam): max_by/min_by keep
    OPPOSITE arbitrary rows under tied ordering keys AND diverge
    semantically on NULL values at the winning key (Spark returns
    the NULL, DuckDB skips the row).  Uniqueness/non-nullness cannot
    be checked statically, so the family is banned in shared SQL —
    spell an explicit window rank (the group_mode pattern)."""
    from oracle_lint import lint_arg_minmax, lint_sql

    bad = [
        "SELECT max_by(name, ts) FROM t GROUP BY user_id",
        "SELECT min_by(x, y) AS first_x FROM t",
        "SELECT arg_max(v, k) FROM t",
        "SELECT ARG_MIN(v, k) FROM t",
        "SELECT g, MAX_BY(a, b) FROM t GROUP BY g",
    ]
    for sql in bad:
        assert lint_arg_minmax(sql), f"rule 12 silent on: {sql}"
    good = [
        # the sanctioned spelling: explicit window rank + tie-break
        "SELECT name FROM (SELECT name, ROW_NUMBER() OVER "
        "(PARTITION BY user_id ORDER BY ts DESC, name ASC) AS rn "
        "FROM t) WHERE rn = 1",
        "SELECT MAX(by_col) FROM t",   # plain MAX of a col named by_*
        "SELECT max(bytes) FROM t",
    ]
    for sql in good:
        assert not lint_arg_minmax(sql), f"rule 12 misfire: {sql}"
    assert lint_sql("SELECT max_by(a, b) FROM t"), (
        "rule 12 not aggregated into lint_sql"
    )


def test_rule_lateral_scalar_agg_fires():
    """Seeded negatives for RULE 13 (the r15 seed-110004 find, pinned
    in test_lateral_scalar_aggregate_empty_slice_cross_engine_seam):
    a comma/CROSS LATERAL whose body is an UNGROUPED aggregate loses
    whole rows on one engine only (Spark emits the mandatory
    aggregate row per outer; DuckDB prunes empty slices).  Sanctioned
    spelling: LEFT JOIN LATERAL ... ON true (+ COALESCE for COUNT)."""
    from oracle_lint import lint_lateral_scalar_agg, lint_sql

    bad = [
        "SELECT n.k, t.mx FROM nation n, LATERAL ("
        "SELECT MAX(c.v) AS mx FROM customer c WHERE c.k = n.k) t",
        "SELECT n.k, t.n FROM nation n CROSS JOIN LATERAL ("
        "SELECT COUNT(*) AS n FROM customer c WHERE c.k = n.k) t",
        # derived-table wrap is NOT sanctioned (aligns only when a
        # window blocks DuckDB's rewrite)
        "SELECT n.k, t.mx FROM nation n, LATERAL ("
        "SELECT SUM(s.v) AS mx FROM (SELECT v FROM c WHERE c.k = n.k) s) t",
    ]
    for sql in bad:
        assert lint_lateral_scalar_agg(sql), f"rule 13 silent on: {sql}"
    good = [
        # the sanctioned join
        "SELECT n.k, COALESCE(t.n, 0) AS n FROM nation n "
        "LEFT JOIN LATERAL (SELECT COUNT(*) AS n FROM customer c "
        "WHERE c.k = n.k) t ON true",
        # grouped body: empty groups vanish on BOTH engines
        "SELECT r.k, t.* FROM region r, LATERAL ("
        "SELECT n.n_name, COUNT(*) AS n FROM nation n "
        "WHERE n.rk = r.k GROUP BY n.n_name) t",
        # non-aggregate body (rank filter) — rows, not scalars
        "SELECT d.k, t.m FROM dim d, LATERAL ("
        "SELECT m, RANK() OVER (ORDER BY m) AS rk FROM f "
        "WHERE f.k = d.k) t WHERE t.rk <= 2",
        # aggregate only INSIDE a nested subquery, body itself scalar-free
        "SELECT d.k, t.m FROM dim d, LATERAL ("
        "SELECT m FROM f WHERE f.k = d.k AND f.v > "
        "(SELECT AVG(v) FROM f)) t",
        # window-ONLY body (r16 ADVICE fix): SUM(..) OVER is a per-row
        # computation — the lateral still returns one row per slice
        # element, empty slices vanish on BOTH engines (latwin fuzz)
        "SELECT d.k, t.rs FROM dim d, LATERAL ("
        "SELECT SUM(v) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS rs "
        "FROM f WHERE f.k = d.k) t",
        # two window aggregates, one with a frame, one named-window
        "SELECT d.k, t.* FROM dim d CROSS JOIN LATERAL ("
        "SELECT AVG(v) OVER (PARTITION BY g) AS a, "
        "COUNT(*) OVER w AS c FROM f WHERE f.k = d.k "
        "WINDOW w AS (ORDER BY v)) t",
    ]
    for sql in good:
        assert not lint_lateral_scalar_agg(sql), f"rule 13 misfire: {sql}"
    # MIXED body — a true scalar aggregate alongside a window call
    # must STILL flag (the window exemption is per-call, not per-body)
    assert lint_lateral_scalar_agg(
        "SELECT d.k, t.* FROM dim d, LATERAL ("
        "SELECT MAX(v) AS mx, SUM(v) OVER (ORDER BY v) AS rs "
        "FROM f WHERE f.k = d.k) t"
    ), "rule 13 must still fire when a scalar aggregate accompanies a window"
    assert lint_sql(
        "SELECT n.k, t.mx FROM n, LATERAL (SELECT MAX(v) AS mx "
        "FROM c WHERE c.k = n.k) t"
    ), "rule 13 not aggregated into lint_sql"
