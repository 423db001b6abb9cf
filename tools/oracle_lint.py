"""Registry lint for the pinned cross-engine seam HOUSE RULES.

Round 12 pinned six Spark-vs-DuckDB seams (the *_cross_engine_seam
tests in tests/test_random_differential.py document each
divergence); three of them come with a house
rule every registered oracle AND builder-side SQL string must follow,
previously enforced by hand-audits.  This lint automates the audits
(r12 verdict item #3):

1. **implicit-ASC NULLS** — Spark places NULLs FIRST under implicit
   ASC, DuckDB LAST, so rank/ORDER BY+LIMIT over a NULLABLE key can
   return DIFFERENT ROWS.  House rule: a sort key whose expression can
   produce NULL (NULLIF / TRY_* / 2-arg LEAD/LAG / CASE without ELSE /
   a bare NULL literal) must spell NULLS FIRST or NULLS LAST, or wrap
   the nullable construct in COALESCE/IFNULL.  Base-table columns are
   null-free in every driver fixture (attested by
   tests/test_oracle_lint.py from parquet null counts), so construct
   nullability is the whole exposure.
2. **bare concat over nullable args** — Spark concat() propagates
   NULL, DuckDB concat() SKIPS NULL args.  House rule: concat() whose
   argument list contains a null-producing construct must COALESCE it
   (or use || which NULL-propagates on both engines).
3. **DATE + INTERVAL projected without CAST** — Spark returns DATE,
   DuckDB TIMESTAMP; equal instants hash DIFFERENTLY through the
   driver's pandas view.  House rule: a SELECT item whose value is
   DATE-typed interval arithmetic (operand spelled DATE '..',
   CAST(.. AS DATE), TO_DATE(..) or DATE(..)) must CAST the result.
   No driver table carries a DATE column (all timestamps), so explicit
   DATE spellings are the whole exposure; TIMESTAMP +/- INTERVAL is
   aligned (both engines return TIMESTAMP) and is not flagged.

Linted surfaces: every registered oracle (registry.oracle_map()) and
every SQL-looking string constant in dpu_olap_spark/**/*.py (ast walk,
so builder-side spark.sql() texts are covered without executing them).
Each rule's firing is proven by seeded negative fixtures in
tests/test_oracle_lint.py, which also runs this lint over the full
registry inside the pytest gate (0 offenders required).

Usage: python tools/oracle_lint.py    (exits nonzero on offenders)
"""

from __future__ import annotations

import ast
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# A construct that can introduce NULL into an otherwise null-free
# expression (base columns are null-free in all driver fixtures).
# 3-arg lead/lag with a literal default is handled by the COALESCE
# carve-out below only when spelled coalesce(lead(..)) — the lint is
# deliberately conservative: spelling NULLS FIRST/LAST is always legal.
_NULLY = re.compile(
    r"\b(nullif|try_[a-z_]+)\s*\(|\b(lead|lag)\s*\(", re.IGNORECASE
)
_BARE_NULL = re.compile(r"(?<![a-z_])null(?![a-z_])", re.IGNORECASE)
_NULLS_SPEC = re.compile(r"\bnulls\s+(first|last)\b", re.IGNORECASE)
_CASE_NO_ELSE = re.compile(r"\bcase\b", re.IGNORECASE)
_DATE_SPELLING = re.compile(
    r"\bdate\s*'|\bas\s+date\b|\bto_date\s*\(|(?<![a-z_])date\s*\(",
    re.IGNORECASE,
)
_INTERVAL_ARITH = re.compile(r"[+-]\s*interval\b", re.IGNORECASE)


def _strip_comments(sql: str) -> str:
    sql = re.sub(r"--[^\n]*", " ", sql)
    return re.sub(r"/\*.*?\*/", " ", sql, flags=re.DOTALL)


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on `sep` at paren depth 0, respecting single quotes."""
    out, buf, depth, in_str = [], [], 0, False
    for ch in s:
        if in_str:
            buf.append(ch)
            if ch == "'":
                in_str = False
            continue
        if ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == sep and depth == 0:
            out.append("".join(buf))
            buf = []
            continue
        buf.append(ch)
    out.append("".join(buf))
    return out


_ORDER_BY = re.compile(r"\border\s+by\b", re.IGNORECASE)
# clause terminators that end an ORDER BY list at depth 0
_OB_END = re.compile(
    r"\b(limit|rows|range|offset|union|intersect|except|window|having)\b"
    r"|;",
    re.IGNORECASE,
)


def _order_by_lists(sql: str) -> list[str]:
    """Every ORDER BY item list (window-spec and statement-level),
    text from after ORDER BY to the clause end at its own depth."""
    sql = _strip_comments(sql)
    lists = []
    for m in _ORDER_BY.finditer(sql):
        start = m.end()
        depth, in_str, i = 0, False, start
        while i < len(sql):
            ch = sql[i]
            if in_str:
                if ch == "'":
                    in_str = False
            elif ch == "'":
                in_str = True
            elif ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    break
                depth -= 1
            elif depth == 0:
                tail = _OB_END.match(sql, i)
                if tail:
                    break
            i += 1
        lists.append(sql[start:i])
    return lists


def _is_nullable_expr(item: str) -> bool:
    """Can this sort-key/argument expression produce NULL, given
    null-free base columns?  COALESCE/IFNULL at any enclosing level is
    accepted as the fix (conservative: a partial COALESCE that doesn't
    actually cover the nullable construct still passes — spelling
    NULLS FIRST/LAST is the airtight form)."""
    low = item.lower()
    if "coalesce" in low or "ifnull" in low:
        return False
    if _NULLY.search(item):
        return True
    # CASE without ELSE yields NULL on no-match
    for m in _CASE_NO_ELSE.finditer(low):
        seg = low[m.end():]
        end = seg.find(" end")
        seg = seg if end < 0 else seg[:end]
        if "else" not in seg:
            return True
    # a bare NULL literal inside the expression (not IS NULL / NULLS)
    cleaned = re.sub(r"\bis\s+(not\s+)?null\b", " ", low)
    cleaned = _NULLS_SPEC.sub(" ", cleaned)
    return bool(_BARE_NULL.search(cleaned))


def lint_order_by_nulls(sql: str) -> list[str]:
    """Rule 1: nullable sort keys must spell NULLS FIRST/LAST."""
    hits = []
    for lst in _order_by_lists(sql):
        for item in _split_top_level(lst):
            item = item.strip()
            if not item or _NULLS_SPEC.search(item):
                continue
            if _is_nullable_expr(item):
                hits.append(
                    f"nullable sort key without NULLS FIRST/LAST: "
                    f"{item[:80]!r}"
                )
    return hits


_CONCAT = re.compile(r"(?<![a-z_])concat\s*\(", re.IGNORECASE)


def _call_args(sql: str, open_paren: int) -> str:
    depth, in_str, i = 1, False, open_paren + 1
    while i < len(sql) and depth:
        ch = sql[i]
        if in_str:
            if ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        i += 1
    return sql[open_paren + 1 : i - 1]


def lint_concat_null(sql: str) -> list[str]:
    """Rule 2: concat() must not take a null-producing argument."""
    sql = _strip_comments(sql)
    hits = []
    for m in _CONCAT.finditer(sql):
        args = _call_args(sql, m.end() - 1)
        for a in _split_top_level(args):
            if _is_nullable_expr(a):
                hits.append(
                    f"bare concat over nullable arg: {a.strip()[:80]!r}"
                )
    return hits


def _cast_wrapped(sql: str, pos: int) -> bool:
    """True when position ``pos`` sits inside some enclosing
    CAST( .. ) — the accepted fix for the result-TYPE seam rules
    (3, 4, 11)."""
    k, depth = pos - 1, 0
    while k >= 0:
        ch = sql[k]
        if ch == ")":
            depth += 1
        elif ch == "(":
            if depth == 0:
                head = sql[max(0, k - 12):k].lower()
                if re.search(r"\bcast\s*$", head):
                    return True
            else:
                depth -= 1
        k -= 1
    return False


def lint_date_interval(sql: str) -> list[str]:
    """Rule 3: a projected DATE +/- INTERVAL must be CAST.  Flags any
    interval arithmetic whose same-depth-adjacent text spells a DATE
    type and that is not inside a CAST(...) / comparison context."""
    sql = _strip_comments(sql)
    hits = []
    for m in _INTERVAL_ARITH.finditer(sql):
        # the smallest enclosing paren group or statement fragment
        start = m.start()
        depth, j = 0, start - 1
        grp_start = 0
        while j >= 0:
            ch = sql[j]
            if ch == ")":
                depth += 1
            elif ch == "(":
                if depth == 0:
                    grp_start = j
                    break
                depth -= 1
            j -= 1
        frag = sql[grp_start:m.end() + 40]
        if not _DATE_SPELLING.search(frag):
            continue  # timestamp arithmetic — aligned on both engines
        if not _cast_wrapped(sql, start):
            hits.append(
                f"DATE +/- INTERVAL not wrapped in CAST: "
                f"{sql[m.start():m.end() + 30]!r}"
            )
    return hits


_COARSE_TRUNC = re.compile(
    r"\bdate_trunc\s*\(\s*'(day|week|month|quarter|year|decade|"
    r"century|millennium)'",
    re.IGNORECASE,
)


def lint_date_trunc(sql: str) -> list[str]:
    """Rule 4 (r13 probe find): date_trunc at DAY-or-coarser
    granularity returns DATE in DuckDB but TIMESTAMP in Spark (sub-day
    parts return TIMESTAMP on both) — equal instants, diverging
    result types.  House rule: CAST the result in shared SQL (every
    pre-r13 oracle already did, by hand; this automates the audit).
    Pinned in test_date_trunc_result_type_cross_engine_seam."""
    sql = _strip_comments(sql)
    hits = []
    for m in _COARSE_TRUNC.finditer(sql):
        if not _cast_wrapped(sql, m.start()):
            hits.append(
                f"coarse date_trunc not wrapped in CAST: "
                f"{sql[m.start():m.end() + 25]!r}"
            )
    return hits


_REGEXP_CALL = re.compile(r"\bregexp_\w+\s*\(", re.IGNORECASE)
_REPL_REF = re.compile(r"'[^']*\$\d")


def lint_regex_portability(sql: str) -> list[str]:
    """Rule 5 (r13 probe finds): Spark compiles regexes with java.util
    .regex, DuckDB with RE2, and the two SILENTLY diverge on exactly
    the constructs the house style already avoided:
    - lookaround `(?=..)` / `(?!..)` / `(?<..)`: Java matches, RE2
      matches EMPTY without erroring;
    - backslash classes/anchors (\\d, \\w, \\b): Spark's SQL string
      literal processes the backslash escape while DuckDB's does not,
      so the ENGINES RECEIVE DIFFERENT PATTERN STRINGS — '\\\\d+'
      matches digits in Spark and a literal backslash-d in DuckDB;
    - replacement group refs: Java spells `$1`, RE2 `\\1` — the same
      replacement text cannot work on both.
    House rule: shared regexes use bracket classes ([0-9], [a-z]),
    explicit anchors (^ $), and group-free replacements."""
    sql_nc = _strip_comments(sql)
    hits = []
    for m in _REGEXP_CALL.finditer(sql_nc):
        args = _call_args(sql_nc, m.end() - 1)
        if "\\" in args:
            hits.append(
                f"backslash in shared regex (engines receive different "
                f"patterns): {args.strip()[:60]!r}"
            )
        if "(?=" in args or "(?!" in args or "(?<" in args:
            hits.append(
                f"lookaround in shared regex (RE2 silently matches "
                f"empty): {args.strip()[:60]!r}"
            )
        if _REPL_REF.search(args):
            hits.append(
                f"$N replacement ref in shared regex (RE2 spells \\N): "
                f"{args.strip()[:60]!r}"
            )
    return hits


_LIKE_PAT = re.compile(r"\bLIKE\s+'([^']*)'(\s+ESCAPE)?", re.IGNORECASE)


def lint_like_escape(sql: str) -> list[str]:
    """Rule 6 (r13 probe find): Spark's LIKE treats backslash as the
    DEFAULT escape character ('a\\_b' matches the literal a_b), DuckDB
    has NO default escape ('a\\_b' is a literal backslash + any-char +
    b) — same pattern, silently different rows.  House rule: a LIKE
    pattern containing a backslash must carry an explicit ESCAPE
    clause (portable) or restate without the escape."""
    sql_nc = _strip_comments(sql)
    hits = []
    for m in _LIKE_PAT.finditer(sql_nc):
        if "\\" in m.group(1) and not m.group(2):
            hits.append(
                f"backslash in LIKE pattern without ESCAPE clause "
                f"(Spark default-escapes, DuckDB doesn't): "
                f"{m.group(1)[:40]!r}"
            )
    return hits


_LEFT_RIGHT = re.compile(r"(?<![a-z_])(left|right)\s*\(", re.IGNORECASE)


def lint_left_right_negative(sql: str) -> list[str]:
    """Rule 7 (r13 probe find): left/right with a NEGATIVE length
    return '' in Spark but drop-from-the-other-end in DuckDB
    (left('hello', -2) = '' vs 'hel') — silent row divergence.  House
    rule: the length argument in shared SQL must be a non-negative
    integer LITERAL (an expression could go negative at runtime)."""
    sql_nc = _strip_comments(sql)
    hits = []
    for m in _LEFT_RIGHT.finditer(sql_nc):
        # skip JOIN keywords (LEFT JOIN / RIGHT JOIN never look like
        # calls — the regex requires the open paren directly)
        args = _call_args(sql_nc, m.end() - 1)
        parts = _split_top_level(args)
        if len(parts) != 2:
            continue
        if not re.fullmatch(r"\s*\d+\s*", parts[1]):
            hits.append(
                f"{m.group(1)}() with non-literal length (negative "
                f"lengths diverge: '' in Spark, drop-from-end in "
                f"DuckDB): {args.strip()[:60]!r}"
            )
    return hits


_ARRAY_AGG = re.compile(
    r"\b(array_agg|list)\s*\(", re.IGNORECASE
)


def lint_array_agg_null(sql: str) -> list[str]:
    """Rule 8 (r13 probe find): array_agg/list over a NULL-producing
    expression SKIPS NULLs in Spark but KEEPS them in DuckDB —
    different element counts, silent hash divergence.  House rule:
    aggregate only null-free expressions (base columns are null-free;
    COALESCE nullable constructs first)."""
    sql_nc = _strip_comments(sql)
    hits = []
    for m in _ARRAY_AGG.finditer(sql_nc):
        args = _call_args(sql_nc, m.end() - 1)
        # the aggregated expression is the first top-level arg,
        # before any ORDER BY inside the call
        expr = _split_top_level(args)[0]
        expr = re.split(r"\border\s+by\b", expr, flags=re.IGNORECASE)[0]
        if _is_nullable_expr(expr):
            hits.append(
                f"array_agg over nullable expr (Spark skips NULLs, "
                f"DuckDB keeps them): {expr.strip()[:60]!r}"
            )
    return hits


_CAST_OPEN = re.compile(r"\bcast\s*\(", re.IGNORECASE)
_FRAC_AGG_HEAD = re.compile(
    r"^\s*(median|percentile_cont|percentile_disc|percentile|"
    r"quantile_cont|avg|mean)\s*\(",
    re.IGNORECASE,
)
_INT_TARGET = re.compile(
    r"^\s*(bigint|integer|int|smallint|tinyint|long)\s*$", re.IGNORECASE
)
_FRACTION_LIT = re.compile(r"^\s*(0?\.\d+|0|1|1\.0)\s*$")


def _call_end(sql: str, open_paren: int) -> int:
    """Index one past the close paren matching ``sql[open_paren]``."""
    depth, in_str, i = 1, False, open_paren + 1
    while i < len(sql) and depth:
        ch = sql[i]
        if in_str:
            if ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        i += 1
    return i


def _top_level_factors(expr: str) -> list[int]:
    """Integer literals that multiply the WHOLE expression: the
    expression must be a pure top-level product (a depth-0 binary + or
    - means no factor scales everything — ``x + 2*y`` has none), and
    the factors are its pure-integer-literal product parts."""
    s = re.sub(r"^\s*[+-]\s*", "", expr.strip())
    depth, in_str, prev = 0, False, ""
    for ch in s:
        if in_str:
            if ch == "'":
                in_str = False
            continue
        if ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch in "+-" and depth == 0 and prev and prev not in "*/%(,+-":
            return []  # top-level additive term — not a whole-expr scale
        if not ch.isspace():
            prev = ch
    parts = [p.strip() for p in _split_top_level(s, "*")]
    if len(parts) < 2:
        return []
    return [int(p) for p in parts if re.fullmatch(r"\d+", p)]


def _scoped_factors(inner: str, head: "re.Match[str]") -> list[int]:
    """Clearing factors for rule 9, SCOPED (r14 ADVICE): a factor
    counts only when it multiplies the aggregate's value/order argument
    or the whole aggregate result at top level — a ``*2`` buried inside
    ``median(x + 2*y)`` clears nothing and no longer passes."""
    factors: list[int] = []
    # (a) each top-level argument of the aggregate call
    for a in _split_top_level(_call_args(inner, head.end() - 1)):
        factors += _top_level_factors(a)
    # (b) the WITHIN GROUP (ORDER BY <expr>) order expression(s)
    call_end = _call_end(inner, head.end() - 1)
    wg = re.match(r"(?is)\s*within\s+group\s*\(", inner[call_end:])
    atom_end = call_end
    if wg:
        wg_open = call_end + wg.end() - 1
        wg_args = _call_args(inner, wg_open)
        order = re.sub(r"(?is)^\s*order\s+by\b", "", wg_args)
        for item in _split_top_level(order):
            # strip trailing ASC/DESC/NULLS specs off each order item
            item = re.sub(
                r"(?is)\b(asc|desc|nulls\s+(first|last))\b", " ", item
            )
            factors += _top_level_factors(item)
        atom_end = _call_end(inner, wg_open)
    # (c) the whole aggregate result multiplied from outside:
    # replace the call (plus WITHIN GROUP clause) with an atom
    factors += _top_level_factors(
        inner[: head.start()] + " aggx " + inner[atom_end:]
    )
    return factors


def lint_fractional_cast(sql: str) -> list[str]:
    """Rule 9 (r14 probe find): double -> integer CAST semantics
    DIVERGE — Spark TRUNCATES toward zero (3.5 -> 3, 2.9 -> 2),
    DuckDB ROUNDS half-to-even (3.5 -> 4, 2.9 -> 3) — so
    CAST(<interpolating aggregate> AS BIGINT) silently differs
    whenever the double is non-integral.  House rule (the registry's
    existing multiply-through discipline, now machine-enforced):
    - CAST(avg/mean(..) AS int) is NEVER allowed (no multiplier can
      clear the /n denominator — cross-multiply or use SUM DIV COUNT);
    - CAST(median/percentile-family(..) AS int) needs a visible EVEN
      multiply-through for p = 0.5 (median of even ints is an
      integer), a multiple-of-4 factor for p in {0.25, 0.75}, and any
      other fractional p is flagged outright (only binary-exact
      fractions with a clearing factor are integral by construction);
    - percentile_disc/p in {0, 1} pick actual elements and pass.
    Integral-by-construction spellings (floor/round/DIV before the
    CAST) are untouched — the rule keys on the aggregate head."""
    sql_nc = _strip_comments(sql)
    hits = []
    for m in _CAST_OPEN.finditer(sql_nc):
        args = _call_args(sql_nc, m.end() - 1)
        split = re.match(r"(?is)^(.*)\s+as\s+(\w+)\s*$", args)
        if not split or not _INT_TARGET.match(split.group(2)):
            continue
        inner = split.group(1)
        head = _FRAC_AGG_HEAD.match(inner)
        if not head:
            continue
        fn = head.group(1).lower()
        if fn in ("avg", "mean"):
            hits.append(
                f"CAST({fn}(..) AS {split.group(2).upper()}) — Spark "
                f"truncates, DuckDB rounds; no multiply-through can "
                f"clear /n: {inner.strip()[:60]!r}"
            )
            continue
        if fn == "percentile_disc":
            continue  # picks an actual element — integral over ints
        fn_args = _split_top_level(_call_args(inner, head.end() - 1))
        fracs = [
            a.strip() for a in fn_args if _FRACTION_LIT.match(a)
        ]
        p = fracs[-1] if fracs else ("0.5" if fn == "median" else None)
        if p in ("0", "1", "1.0"):
            continue
        factors = _scoped_factors(inner, head)
        if p == "0.5":
            if any(f % 2 == 0 for f in factors):
                continue
            need = "an even multiply-through (median of even ints)"
        elif p in ("0.25", "0.75", ".25", ".75"):
            if any(f % 4 == 0 for f in factors):
                continue
            need = "a multiple-of-4 multiply-through"
        else:
            need = "a binary-exact fraction (0.25/0.5/0.75) plus factor"
        hits.append(
            f"CAST({fn}(..) AS {split.group(2).upper()}) without "
            f"{need} — Spark truncates, DuckDB rounds half-to-even: "
            f"{inner.strip()[:60]!r}"
        )
    return hits


_SUBSTR = re.compile(r"\b(substr|substring)\s*\(", re.IGNORECASE)
_LR_TRIM = re.compile(r"\b(ltrim|rtrim)\s*\(", re.IGNORECASE)


def lint_substr_trim(sql: str) -> list[str]:
    """Rule 10 (r14 probe find, pinned in
    test_substr_zero_trim_order_dow_cross_engine_seam):
    - substr(s, 0, n): Spark treats start 0 like start 1 and yields n
      chars; DuckDB consumes one count unit on the empty slot before
      position 1 and yields n-1 — silent value divergence.  House
      rule: shared SQL uses 1-based or negative LITERAL starts only;
      a literal start 0 flags even without a length (the two-arg form
      aligns today, but adding a length later must not create a
      silent edge).  Non-literal starts can't be linted statically.
    - two-arg ltrim/rtrim: the SAME text parses with SWAPPED argument
      roles — Spark reads ltrim(trimStr, src), DuckDB ltrim(src,
      chars), so ltrim('xxaxx', 'x') is '' vs 'axx'.  House rule:
      character-set trims spell the ANSI form
      trim(LEADING/TRAILING/BOTH 'x' FROM s), identical on both
      engines; 1-arg whitespace ltrim/rtrim stay legal."""
    sql_nc = _strip_comments(sql)
    hits = []
    for m in _SUBSTR.finditer(sql_nc):
        args = _call_args(sql_nc, m.end() - 1)
        parts = _split_top_level(args)
        start = parts[1].strip() if len(parts) >= 2 else None
        if start is None:
            # ANSI spelling: substring(s FROM p [FOR n])
            fm = re.search(r"(?is)\bfrom\s+(\S+)", parts[0])
            start = fm.group(1).strip() if fm else None
        if start is not None and re.fullmatch(r"\+?0", start):
            hits.append(
                f"substr/substring start 0 (Spark yields n chars, "
                f"DuckDB n-1): {args.strip()[:60]!r}"
            )
    for m in _LR_TRIM.finditer(sql_nc):
        args = _call_args(sql_nc, m.end() - 1)
        if len(_split_top_level(args)) == 2:
            hits.append(
                f"two-arg {m.group(1).lower()}() (argument roles are "
                f"SWAPPED between engines) — spell "
                f"trim(LEADING/TRAILING 'x' FROM s): "
                f"{args.strip()[:60]!r}"
            )
    return hits


_FLOOR_CEIL_SIGN = re.compile(
    r"\b(floor|ceil|ceiling|sign)\s*\(", re.IGNORECASE
)


def lint_floor_ceil_sign(sql: str) -> list[str]:
    """Rule 11 (r15 probe find, pinned in
    test_floor_ceil_sign_result_type_cross_engine_seam): over DOUBLE
    input the result TYPES diverge silently — floor/ceil/ceiling
    return BIGINT in Spark but DOUBLE in DuckDB (300 vs 300.0 through
    the driver's strict value view), and sign() returns DOUBLE in
    Spark but an integer in DuckDB (-1.0 vs -1).  Equal values,
    diverging types — the same class as rules 3/4.  House rule
    (the registry's existing cents discipline, now machine-enforced):
    every floor/ceil/ceiling/sign in shared SQL must sit inside a
    CAST(...), which normalizes the type on both engines."""
    sql_nc = _strip_comments(sql)
    hits = []
    for m in _FLOOR_CEIL_SIGN.finditer(sql_nc):
        if not _cast_wrapped(sql_nc, m.start()):
            hits.append(
                f"{m.group(1).lower()}() not wrapped in CAST (Spark/"
                f"DuckDB result types diverge over DOUBLE): "
                f"{sql_nc[m.start():m.end() + 25]!r}"
            )
    return hits


_ARG_MINMAX = re.compile(
    r"\b(max_by|min_by|arg_max|arg_min|argmax|argmin)\s*\(", re.IGNORECASE
)


def lint_arg_minmax(sql: str) -> list[str]:
    """Rule 12 (r15 probe find, pinned in
    test_max_by_min_by_cross_engine_seam): max_by/min_by diverge on
    BOTH axes that matter —
    - TIED ordering keys: each engine keeps an arbitrary row and in
      practice they pick OPPOSITE ones (Spark 'b', DuckDB 'a' on the
      same two-row input);
    - NULL values at the winning key: Spark returns the row's NULL
      value, DuckDB SKIPS null-valued rows entirely and returns the
      runner-up ('a' vs NULL — a semantic divergence, not tie luck).
    A static lint cannot verify key uniqueness or value
    non-nullness, so the house rule bans the whole family in shared
    SQL; sanctioned spelling: an explicit ROW_NUMBER/RANK window
    over (key DESC/ASC, full tie-break) — the group_mode pattern.
    arg_max/arg_min (DuckDB-only) and 3-arg forms fail loudly on one
    engine and are flagged for the same reason."""
    sql_nc = _strip_comments(sql)
    return [
        f"{m.group(1).lower()}() — unspecified tie-break AND "
        f"diverging NULL-value handling (Spark keeps the NULL, DuckDB "
        f"skips the row); spell an explicit window rank instead: "
        f"{sql_nc[m.start():m.end() + 25]!r}"
        for m in _ARG_MINMAX.finditer(sql_nc)
    ]


_LATERAL_OPEN = re.compile(r"\blateral\s*\(", re.IGNORECASE)
_AGG_HEAD_ANY = re.compile(
    r"\b(max|min|sum|count|avg|mean|median|stddev\w*|var\w*|"
    r"percentile\w*|string_agg|listagg|array_agg|bool_\w+)\s*\(",
    re.IGNORECASE,
)
_LEFT_JOIN_TAIL = re.compile(r"(?is)left\s+(outer\s+)?join\s*$")


def _top_level_text(s: str) -> str:
    """s with everything inside nested parens blanked — leaves only
    the expression's own top-level tokens."""
    out = []
    depth = 0
    for ch in s:
        if ch == "(":
            depth += 1
            out.append("(")
        elif ch == ")":
            depth = max(0, depth - 1)
            out.append(")")
        else:
            out.append(ch if depth == 0 else " ")
    return "".join(out)


def _has_scalar_agg(head: str) -> bool:
    """True iff ``head`` (top-level masked text before FROM) contains
    an aggregate call that is NOT a window function.  ``SUM(x) OVER
    (...)`` is a per-row window computation — the lateral body still
    returns one row per slice element, both engines drop empty slices
    identically (the repo's latwin/winover fuzz families prove it), so
    rule 13 must not fire on it (r15 ADVICE fix).  The head text comes
    from _top_level_text, so call interiors are blanked but the parens
    themselves survive — walk to the aggregate's matching close paren
    and check for a following top-level OVER."""
    for m in _AGG_HEAD_ANY.finditer(head):
        depth = 0
        close = -1
        for i in range(m.end() - 1, len(head)):
            if head[i] == "(":
                depth += 1
            elif head[i] == ")":
                depth -= 1
                if depth == 0:
                    close = i
                    break
        if close < 0:
            return True  # unbalanced — conservatively flag
        tail = head[close + 1:].lstrip()
        # OVER ( ... )  or a named window: OVER w
        if re.match(r"(?i)over\b", tail):
            continue  # window function, not a scalar aggregate
        # FILTER (...) OVER (...) — aggregate-with-filter window form
        fm = re.match(r"(?i)filter\s*\(", tail)
        if fm:
            d, j = 0, fm.end() - 1
            while j < len(tail):
                if tail[j] == "(":
                    d += 1
                elif tail[j] == ")":
                    d -= 1
                    if d == 0:
                        break
                j += 1
            if re.match(r"(?i)\s*over\b", tail[j + 1:]):
                continue
        return True
    return False


def lint_lateral_scalar_agg(sql: str) -> list[str]:
    """Rule 13 (r15 probe find seed 110004, pinned in
    test_lateral_scalar_aggregate_empty_slice_cross_engine_seam): a
    comma/CROSS-joined LATERAL whose body is an UNGROUPED aggregate
    diverges SILENTLY on empty correlated slices — Spark emits the
    SQL-standard mandatory aggregate row per outer (MAX->NULL,
    COUNT->0), DuckDB's decorrelation rewrites to a grouped join and
    PRUNES outers whose slice is empty, so whole rows vanish from one
    engine only.  Wrapping the slice in a derived table is NOT a
    reliable fix (it aligns only when a window function blocks
    DuckDB's rewrite).  House rule: a scalar-aggregate lateral body
    must be joined LEFT JOIN LATERAL ... ON true, with COALESCE on
    COUNT-like reads (0 vs null-extension).  Grouped lateral bodies
    (GROUP BY inside) are untouched — both engines drop empty groups
    there.  Window-only bodies (every aggregate-named call followed
    by OVER) are per-row computations, aligned on both engines (the
    latwin fuzz families prove it) — exempt (r16 ADVICE fix)."""
    sql_nc = _strip_comments(sql)
    hits = []
    for m in _LATERAL_OPEN.finditer(sql_nc):
        if _LEFT_JOIN_TAIL.search(sql_nc[: m.start()].rstrip()):
            continue  # LEFT JOIN LATERAL — the sanctioned join
        body = _call_args(sql_nc, m.end() - 1)
        top = _top_level_text(body)
        if re.search(r"\bgroup\s+by\b", top, re.IGNORECASE):
            continue  # grouped body: empty groups vanish on BOTH
        from_m = re.search(r"\bfrom\b", top, re.IGNORECASE)
        head = top[: from_m.start()] if from_m else top
        if _has_scalar_agg(head):
            hits.append(
                "comma/CROSS LATERAL with an ungrouped aggregate body "
                "— Spark keeps one aggregate row per outer, DuckDB "
                "prunes empty slices; use LEFT JOIN LATERAL ... ON "
                f"true (+ COALESCE for COUNT): {body.strip()[:60]!r}"
            )
    return hits


def lint_sql(sql: str) -> list[str]:
    return (
        lint_order_by_nulls(sql)
        + lint_concat_null(sql)
        + lint_date_interval(sql)
        + lint_date_trunc(sql)
        + lint_regex_portability(sql)
        + lint_like_escape(sql)
        + lint_left_right_negative(sql)
        + lint_array_agg_null(sql)
        + lint_fractional_cast(sql)
        + lint_substr_trim(sql)
        + lint_floor_ceil_sign(sql)
        + lint_arg_minmax(sql)
        + lint_lateral_scalar_agg(sql)
    )


_SQLISH = re.compile(r"\b(select|order\s+by|concat|interval)\b", re.IGNORECASE)


def iter_builder_sql(pkg_dir: str | None = None):
    """Yield (path, lineno, text) for every SQL-looking string constant
    in the engine package — covers builder-side spark.sql() texts and
    expr() fragments without executing any query."""
    root = Path(pkg_dir or Path(__file__).resolve().parent.parent
                / "dpu_olap_spark")
    for py in sorted(root.rglob("*.py")):
        tree = ast.parse(py.read_text(), filename=str(py))
        # docstrings are prose, not executable SQL — a docstring
        # QUOTING a seam spelling (e.g. "floor(x*100+0.5)") must not
        # trip the type-seam rules (first hit: rule 11 vs q_pipe_sql's
        # docstring).  Exclude the leading string constant of every
        # module/class/function body.
        docstrings: set[int] = set()
        for node in ast.walk(tree):
            if isinstance(
                node, (ast.Module, ast.ClassDef, ast.FunctionDef,
                       ast.AsyncFunctionDef)
            ) and node.body:
                first = node.body[0]
                if (
                    isinstance(first, ast.Expr)
                    and isinstance(first.value, ast.Constant)
                    and isinstance(first.value.value, str)
                ):
                    docstrings.add(id(first.value))
        fstring_parts: set[int] = set()
        for node in ast.walk(tree):
            # f-strings (spark.sql(f"... {view} ...")) lint as their
            # constant fragments joined with a placeholder identifier,
            # so the rules still see ORDER BY / concat / INTERVAL
            # shapes around the interpolation holes
            if isinstance(node, ast.JoinedStr):
                text = "".join(
                    v.value if isinstance(v, ast.Constant)
                    and isinstance(v.value, str) else " __hole__ "
                    for v in node.values
                )
                for v in ast.walk(node):
                    if isinstance(v, ast.Constant):
                        fstring_parts.add(id(v))
                if len(text) > 15 and _SQLISH.search(text):
                    yield str(py), node.lineno, text
            elif (
                isinstance(node, ast.Constant)
                and isinstance(node.value, str)
                and id(node) not in fstring_parts
                and id(node) not in docstrings
                and len(node.value) > 15
                and _SQLISH.search(node.value)
            ):
                yield str(py), node.lineno, node.value


def lint_registry() -> list[str]:
    """All offenders across registered oracles + builder SQL strings."""
    from dpu_olap_spark.registry import oracle_map

    offenders = []
    for name, sql in sorted(oracle_map().items()):
        for hit in lint_sql(sql):
            offenders.append(f"oracle:{name}: {hit}")
    for path, lineno, text in iter_builder_sql():
        for hit in lint_sql(text):
            offenders.append(f"{os.path.relpath(path)}:{lineno}: {hit}")
    return offenders


def main() -> int:
    offenders = lint_registry()
    for o in offenders:
        print(o)
    n_oracle = len([o for o in offenders if o.startswith("oracle:")])
    print(
        f"\nlinted registry oracles + builder SQL strings: "
        f"{len(offenders)} offenders ({n_oracle} oracle-side)"
    )
    return 1 if offenders else 0


if __name__ == "__main__":
    raise SystemExit(main())
