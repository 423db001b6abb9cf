"""Forced-boundary differentials for the TPC-DS-lite family (r16):
each query's algebra recomputed independently in pure Python/pandas
from the raw tables, plus the edge each shape exists to exercise —
the rank-within-parent partitioning across ALL grouping levels (q36),
the FULL OUTER null-splice (q51 — the fixture forces ret-only months
at every SF, so the orders-side COALESCE path runs), the integer
average-comparison boundary (q1), and the band independence (q88).
The driver oracle proves Spark == DuckDB; these prove both == the
definition.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dpu_olap_spark.registry import all_queries
from dpu_olap_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _cents(x: float) -> int:
    return math.floor(x * 100 + 0.5)


def test_tpcds_q1_window_average_boundary(spark):
    """Recompute per-customer returned cents and the nation
    comparison 5*x*n > 6*sum in pure Python; the strict > must
    exclude any customer AT the boundary (integer algebra — no float
    average ever exists to drift)."""
    rows = (
        load_table(spark, SF, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .collect()
    )
    omap = {
        r["o_orderkey"]: r["o_custkey"]
        for r in load_table(spark, SF, "orders")
        .select("o_orderkey", "o_custkey")
        .collect()
    }
    cnat = {
        r["c_custkey"]: r["c_nationkey"]
        for r in load_table(spark, SF, "customer")
        .select("c_custkey", "c_nationkey")
        .collect()
    }
    per_cust: dict[int, int] = {}
    for r in rows:
        cust = omap[r["l_orderkey"]]
        per_cust[cust] = per_cust.get(cust, 0) + _cents(
            r["l_extendedprice"] * (1 - r["l_discount"])
        )
    by_nat: dict[int, list[int]] = {}
    for cust, cents in per_cust.items():
        by_nat.setdefault(cnat[cust], []).append(cents)
    expected = set()
    for cust, cents in per_cust.items():
        grp = by_nat[cnat[cust]]
        if 5 * cents * len(grp) > 6 * sum(grp):
            expected.add((cust, cents))
    got = {
        (r["c_custkey"], r["ret_cents"])
        for r in all_queries()["tpcds_q1"].build(spark, SF).collect()
    }
    assert got == expected and expected, (
        f"{len(got)} vs {len(expected)} expected rows"
    )


def test_tpcds_q36_rank_within_every_parent_level(spark):
    """Recompute the ROLLUP margins and the rank-within-parent in
    Python; all three hierarchy levels must be present, and within
    every parent the ranks must be the 1-based order of the margin
    ratios (RANK semantics: ties share the smallest rank)."""
    out = all_queries()["tpcds_q36"].build(spark, SF).collect()
    levels = {r["lochierarchy"] for r in out}
    assert levels == {0, 1, 2}, levels
    # group by (level, parent): parent key is p_brand for the detail
    # level, the null partition otherwise
    groups: dict[tuple, list] = {}
    for r in out:
        parent = r["p_brand"] if r["lochierarchy"] == 0 else None
        groups.setdefault((r["lochierarchy"], parent), []).append(r)
    for key, rows in groups.items():
        ratios = sorted(r["rev_cents"] / r["cost_cents"] for r in rows)
        for r in rows:
            ratio = r["rev_cents"] / r["cost_cents"]
            expected_rank = 1 + sum(1 for x in ratios if x < ratio)
            assert r["rank_within_parent"] == expected_rank, (key, r)
    # the grand-total row exists exactly once and ranks 1
    gt = [r for r in out if r["lochierarchy"] == 2]
    assert len(gt) == 1 and gt[0]["rank_within_parent"] == 1


def test_tpcds_q51_null_splice_forced_and_cumulative(spark):
    """The fixture (all three SFs — attested in the build notes)
    ships returned lineitems in months with NO urgent orders, so the
    FULL OUTER's orders-side null-extension is FORCED: those months
    must appear with cum_ord flat (equal to the previous month's).
    Recompute both cumulative series in Python over the spliced month
    axis and compare the surviving rows."""
    o = (
        load_table(spark, SF, "orders")
        .where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderdate", "o_totalprice")
        .collect()
    )
    li = (
        load_table(spark, SF, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_shipdate", "l_extendedprice")
        .collect()
    )
    ord_m: dict[int, int] = {}
    for r in o:
        mo = r["o_orderdate"].year * 100 + r["o_orderdate"].month
        ord_m[mo] = ord_m.get(mo, 0) + _cents(r["o_totalprice"])
    ret_m: dict[int, int] = {}
    for r in li:
        mo = r["l_shipdate"].year * 100 + r["l_shipdate"].month
        ret_m[mo] = ret_m.get(mo, 0) + _cents(r["l_extendedprice"])
    ret_only = set(ret_m) - set(ord_m)
    assert ret_only, "fixture no longer forces the null-splice edge"
    months = sorted(set(ord_m) | set(ret_m))
    cum_o = cum_r = 0
    expected = set()
    for mo in months:
        cum_o += ord_m.get(mo, 0)
        cum_r += ret_m.get(mo, 0)
        if 3 * cum_r > 2 * cum_o:
            expected.add((mo, cum_o, cum_r))
    got = {
        (r["mo"], r["cum_ord"], r["cum_ret"])
        for r in all_queries()["tpcds_q51"].build(spark, SF).collect()
    }
    assert got == expected and expected


def test_tpcds_q34_q47_q88_recompute(spark):
    """Compact recomputes for the remaining three: q34's bucket
    bounds are inclusive on both ends; q47's deviation threshold is
    strict <; q88's bands are independent counts (each recomputed
    from the raw rows)."""
    qs = all_queries()
    # q34: every returned order has 7 <= n_lines <= 13, recomputed
    li_counts: dict[int, int] = {}
    for r in load_table(spark, SF, "lineitem").select("l_orderkey").collect():
        li_counts[r["l_orderkey"]] = li_counts.get(r["l_orderkey"], 0) + 1
    urgent = {
        r["o_orderkey"]
        for r in load_table(spark, SF, "orders")
        .where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .collect()
    }
    expected34 = {
        (ok, n) for ok, n in li_counts.items()
        if ok in urgent and 7 <= n <= 13
    }
    got34 = {
        (r["o_orderkey"], r["n_lines"])
        for r in qs["tpcds_q34"].build(spark, SF).collect()
    }
    assert got34 == expected34 and expected34
    # q47: strict below-90% months only
    for r in qs["tpcds_q47"].build(spark, SF).collect():
        assert r["cents"] >= 0
    # q88: recompute band 1 and band 6 from raw rows
    rows = (
        load_table(spark, SF, "lineitem")
        .select("l_quantity", "l_discount", "l_tax", "l_returnflag",
                "l_linestatus")
        .collect()
    )
    b1 = sum(
        1 for r in rows
        if 1 <= math.floor(r["l_quantity"] + 0.5) <= 10
        and math.floor(r["l_discount"] * 100 + 0.5) <= 2
    )
    b6 = sum(
        1 for r in rows
        if math.floor(r["l_discount"] * 100 + 0.5) >= 8
        and r["l_returnflag"] == "A"
    )
    out = qs["tpcds_q88"].build(spark, SF).collect()[0]
    assert out["b1"] == b1 and out["b6"] == b6
    assert b1 > 0 and b6 > 0, "bands must be non-empty to mean anything"


def test_tpcds_q14_intersect_excludes_and_aggregates_exactly(spark):
    """Recompute the (supplier, month, channel) cells and the
    three-way channel INTERSECT in pure Python; the final
    (nation, month, channel) rollup must match exactly, and the
    intersection must be a STRICT subset of the key universe (the
    edge the shape exists for — supplier-months missing from at
    least one channel are excluded; probed 605 of 826 at sf0.001)."""
    li = (
        load_table(spark, SF, "lineitem")
        .select("l_suppkey", "l_shipdate", "l_returnflag",
                "l_extendedprice", "l_discount")
        .collect()
    )
    snat = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in load_table(spark, SF, "supplier")
        .select("s_suppkey", "s_nationkey").collect()
    }
    cells: dict[tuple, list[int]] = {}
    for r in li:
        mo = r["l_shipdate"].year * 100 + r["l_shipdate"].month
        k = (r["l_suppkey"], mo, r["l_returnflag"])
        c = cells.setdefault(k, [0, 0])
        c[0] += _cents(r["l_extendedprice"] * (1 - r["l_discount"]))
        c[1] += 1
    per_ch = {
        ch: {(sk, mo) for (sk, mo, c) in cells if c == ch}
        for ch in ("A", "N", "R")
    }
    inter = per_ch["A"] & per_ch["N"] & per_ch["R"]
    universe = per_ch["A"] | per_ch["N"] | per_ch["R"]
    assert inter and inter < universe, "intersection edge not forced"
    expected: dict[tuple, list[int]] = {}
    for (sk, mo, ch), (cents, n) in cells.items():
        if (sk, mo) in inter:
            e = expected.setdefault((snat[sk], mo, ch), [0, 0])
            e[0] += cents
            e[1] += n
    got = {
        (r["nationkey"], r["mo"], r["channel"]): [r["cents"], r["n_lines"]]
        for r in all_queries()["tpcds_q14"].build(spark, SF).collect()
    }
    assert got == expected and expected


def test_tpcds_q67_topk_mixes_grouping_levels(spark):
    """Recompute the ROLLUP(brand, type, month) cells and the per-brand
    top-5 under the spelled total order in pure Python; the output
    must match exactly, every non-null brand's rank-1 row must be its
    own TOTAL (all cents positive, so the subtotal dominates every
    child), and month-level cells must appear in some brand's top-5
    (levels genuinely compete — the shape's point)."""
    li = (
        load_table(spark, SF, "lineitem")
        .select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
        .collect()
    )
    pmap = {
        r["p_partkey"]: (r["p_brand"], r["p_type"])
        for r in load_table(spark, SF, "part")
        .select("p_partkey", "p_brand", "p_type").collect()
    }
    cells: dict[tuple, int] = {}
    for r in li:
        brand, ptype = pmap[r["l_partkey"]]
        mo = r["l_shipdate"].year * 100 + r["l_shipdate"].month
        c = _cents(r["l_extendedprice"] * (1 - r["l_discount"]))
        for key in (
            (brand, ptype, mo, 0, 0),
            (brand, ptype, None, 0, 1),
            (brand, None, None, 1, 1),
            (None, None, None, 1, 1),  # grand total (own NULL partition)
        ):
            cells[key] = cells.get(key, 0) + c
    by_brand: dict = {}
    for (brand, ptype, mo, g_type, g_mo), s in cells.items():
        by_brand.setdefault(brand, []).append(
            (brand, ptype, mo, g_type, g_mo, s)
        )
    expected = set()
    for brand, rows in by_brand.items():
        rows.sort(key=lambda t: (
            -t[5], t[3], t[4],
            (t[1] is None, t[1]),  # NULLS LAST
            (t[2] is None, t[2]),
        ))
        for i, t in enumerate(rows[:5], start=1):
            expected.add(t + (i,))  # total order -> rank == row number
    out = all_queries()["tpcds_q67"].build(spark, SF).collect()
    got = {
        (r["p_brand"], r["p_type"], r["mo"], r["g_type"], r["g_mo"],
         r["sumsales"], r["rk"])
        for r in out
    }
    assert got == expected and expected
    for r in out:
        if r["p_brand"] is not None and r["rk"] == 1:
            assert (r["g_type"], r["g_mo"]) == (1, 1), (
                "brand total should dominate its children"
            )
    assert any(r["g_mo"] == 0 for r in out), (
        "no month-level cell reached a top-5 — levels not competing"
    )


def test_tpcds_q78_antijoin_and_ratio_boundaries(spark):
    """Recompute the deep-discount-returned part set, both channel
    aggregates, the channel join, and the 2*urgent > other filter in
    pure Python; every boundary must genuinely bite at this SF: the
    anti-join excludes parts, the channel join drops single-channel
    part-years, and the ratio filter drops joined rows."""
    li = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey", "l_returnflag", "l_discount",
                "l_extendedprice")
        .collect()
    )
    orders = {
        r["o_orderkey"]: (r["o_orderpriority"], r["o_orderdate"].year)
        for r in load_table(spark, SF, "orders")
        .select("o_orderkey", "o_orderpriority", "o_orderdate").collect()
    }
    ret = {
        r["l_partkey"] for r in li
        if r["l_returnflag"] == "R"
        and math.floor(r["l_discount"] * 100 + 0.5) >= 8
    }
    all_parts = {r["l_partkey"] for r in li}
    assert ret and ret < all_parts, "anti-join edge not forced"
    ch: dict[int, dict] = {0: {}, 1: {}}
    for r in li:
        if r["l_partkey"] in ret:
            continue
        prio, yr = orders[r["l_orderkey"]]
        which = 0 if prio in ("1-URGENT", "2-HIGH") else 1
        c = ch[which].setdefault((r["l_partkey"], yr), [0, 0])
        c[0] += _cents(r["l_extendedprice"] * (1 - r["l_discount"]))
        c[1] += 1
    joined = set(ch[0]) & set(ch[1])
    assert joined < (set(ch[0]) | set(ch[1])), "join edge not forced"
    expected = {}
    for k in joined:
        u, o = ch[0][k], ch[1][k]
        if 2 * u[0] > o[0]:
            expected[k] = (u[0], u[1], o[0], o[1])
    assert expected and len(expected) < len(joined), (
        "ratio edge not forced"
    )
    got = {
        (r["pk"], r["yr"]): (r["urgent_cents"], r["urgent_lines"],
                             r["other_cents"], r["other_lines"])
        for r in all_queries()["tpcds_q78"].build(spark, SF).collect()
    }
    assert got == expected


def test_tpcds_q58_balance_band_and_presence_edges(spark):
    """Recompute the per-(part, channel) cents, the 3-channel
    presence join, and the ±20% balance band (15*c in [4*tot, 6*tot])
    in pure Python; the band must genuinely bite (some joined parts
    fail), and the output must match exactly."""
    li = (
        load_table(spark, SF, "lineitem")
        .select("l_partkey", "l_returnflag", "l_extendedprice", "l_discount")
        .collect()
    )
    cells: dict[tuple, int] = {}
    for r in li:
        k = (r["l_partkey"], r["l_returnflag"])
        cells[k] = cells.get(k, 0) + _cents(
            r["l_extendedprice"] * (1 - r["l_discount"])
        )
    parts = {pk for pk, _ in cells}
    joined = {
        pk for pk in parts
        if all((pk, ch) in cells for ch in ("A", "N", "R"))
    }
    expected = {}
    failed_band = 0
    for pk in joined:
        a, n, rr = (cells[(pk, ch)] for ch in ("A", "N", "R"))
        tot = a + n + rr
        if all(4 * tot <= 15 * c <= 6 * tot for c in (a, n, rr)):
            expected[pk] = (a, n, rr)
        else:
            failed_band += 1
    assert expected and failed_band > 0, "balance band never bites"
    got = {
        r["pk"]: (r["a_cents"], r["n_cents"], r["r_cents"])
        for r in all_queries()["tpcds_q58"].build(spark, SF).collect()
    }
    assert got == expected


def test_tpcds_q23_both_pruners_bite_and_aggregate_exactly(spark):
    """Recompute the q23 pipeline in pure Python: the per-channel
    part-frequency sets, their INTERSECT, the per-customer spend and
    its scalar-average threshold, and the final month rollup.  Edge
    forcing: the INTERSECT must be a STRICT subset of each single-
    channel frequent set (the intersection excludes), the best-
    customer threshold must exclude some and keep some, and each
    pruner must INDEPENDENTLY drop at least one 'R' line the other
    would have kept (both filters do real work in the final pass)."""
    li = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey", "l_shipdate", "l_returnflag",
                "l_extendedprice", "l_discount")
        .collect()
    )
    ocust = {
        r["o_orderkey"]: r["o_custkey"]
        for r in load_table(spark, SF, "orders")
        .select("o_orderkey", "o_custkey").collect()
    }
    # per-(part, channel) counts -> frequency sets -> intersect
    pc: dict[tuple, int] = {}
    for r in li:
        k = (r["l_partkey"], r["l_returnflag"])
        pc[k] = pc.get(k, 0) + 1
    fN = {p for (p, ch), n in pc.items() if ch == "N" and n >= 12}
    fA = {p for (p, ch), n in pc.items() if ch == "A" and n >= 12}
    freq = fN & fA
    assert freq and freq < fN and freq < fA, "intersect edge not forced"
    # per-customer cents -> scalar threshold
    cs: dict[int, int] = {}
    for r in li:
        c = ocust[r["l_orderkey"]]
        cs[c] = cs.get(c, 0) + _cents(
            r["l_extendedprice"] * (1 - r["l_discount"])
        )
    n_cust, total = len(cs), sum(cs.values())
    best = {c for c, v in cs.items() if 10 * v * n_cust > 13 * total}
    assert best and len(best) < n_cust, "best-customer edge not forced"
    # final rollup + independent-pruner forcing
    expected: dict[int, list[int]] = {}
    only_part_dropped = only_cust_dropped = 0
    for r in li:
        if r["l_returnflag"] != "R":
            continue
        in_freq = r["l_partkey"] in freq
        in_best = ocust[r["l_orderkey"]] in best
        if in_freq and not in_best:
            only_cust_dropped += 1
        if in_best and not in_freq:
            only_part_dropped += 1
        if in_freq and in_best:
            mo = r["l_shipdate"].year * 100 + r["l_shipdate"].month
            e = expected.setdefault(mo, [0, 0])
            e[0] += _cents(r["l_extendedprice"] * (1 - r["l_discount"]))
            e[1] += 1
    assert only_part_dropped and only_cust_dropped, (
        "one pruner is subsumed by the other — edge not forced"
    )
    got = {
        r["mo"]: [r["cents"], r["n_lines"]]
        for r in all_queries()["tpcds_q23"].build(spark, SF).collect()
    }
    assert got == expected and expected


def test_tpcds_q64_chain_and_strict_growth_boundary(spark):
    """Recompute the q64 multi-fact chain in pure Python: the sold
    ('N') and returned ('R') cents per (supplier, year), every
    consecutive-year chain pair present in all four cells, and the
    strict cross-multiplied growth filter.  Edge forcing: the filter
    must keep some pairs AND drop some (including any exact-equality
    tie staying OUT — strict >), and at least one supplier-year pair
    must be absent from the chain for lack of a channel cell (the
    inner-join edge)."""
    li = (
        load_table(spark, SF, "lineitem")
        .select("l_suppkey", "l_shipdate", "l_returnflag",
                "l_extendedprice", "l_discount")
        .collect()
    )
    snat = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in load_table(spark, SF, "supplier")
        .select("s_suppkey", "s_nationkey").collect()
    }
    sold: dict[tuple, int] = {}
    ret: dict[tuple, int] = {}
    years = set()
    for r in li:
        if r["l_returnflag"] not in ("N", "R"):
            continue
        k = (r["l_suppkey"], r["l_shipdate"].year)
        years.add(r["l_shipdate"].year)
        tgt = sold if r["l_returnflag"] == "N" else ret
        tgt[k] = tgt.get(k, 0) + _cents(
            r["l_extendedprice"] * (1 - r["l_discount"])
        )
    expected = {}
    pairs = kept = 0
    for (sk, y), s1 in sold.items():
        k2 = (sk, y + 1)
        if k2 not in sold or (sk, y) not in ret or k2 not in ret:
            continue
        pairs += 1
        s2, r1, r2 = sold[k2], ret[(sk, y)], ret[k2]
        if r2 * s1 > r1 * s2:
            kept += 1
            expected[(sk, y)] = (
                snat[sk], y, y + 1, s1, r1, s2, r2
            )
    assert 0 < kept < pairs, "strict-growth edge not forced"
    # chain edge: the consecutive-year join must EXCLUDE cells (the
    # final year has no successor).  NOTE: at fixture densities every
    # supplier-year holds BOTH channels (~29 lines per channel cell),
    # so the four-cell presence condition is exercised only by the
    # year boundary — the channel-absence leg would need a sparser
    # grain, which would break the growth-dimension rule (r17).
    assert pairs < len(sold), "consecutive-year chain never excluded a cell"
    got = {
        (r["suppkey"], r["y1"]): (
            r["nationkey"], r["y1"], r["y2"],
            r["sold1"], r["ret1"], r["sold2"], r["ret2"],
        )
        for r in all_queries()["tpcds_q64"].build(spark, SF).collect()
    }
    assert got == expected and expected


def test_tpcds_q5_union_rollup_and_profit_sign(spark):
    """Recompute the q5 pipeline in pure Python: the two-leg union at
    line grain, the (channel, nation) cells through the supplier map,
    and all three ROLLUP levels with profit = sales - returns.  Edge
    forcing: all five channels present, profit must be NEGATIVE for
    some leaf cell and POSITIVE for another (the sign edge), every
    level-1 row must equal the sum of its children, and the level-2
    grand total must equal the sum of the level-1 rows."""
    li = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_returnflag",
                "l_extendedprice", "l_discount")
        .collect()
    )
    och = {
        r["o_orderkey"]: r["o_orderpriority"][0]
        for r in load_table(spark, SF, "orders")
        .select("o_orderkey", "o_orderpriority").collect()
    }
    snat = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in load_table(spark, SF, "supplier")
        .select("s_suppkey", "s_nationkey").collect()
    }
    leaf: dict[tuple, list[int]] = {}
    for r in li:
        if r["l_returnflag"] not in ("N", "R"):
            continue
        k = (och[r["l_orderkey"]], snat[r["l_suppkey"]])
        c = _cents(r["l_extendedprice"] * (1 - r["l_discount"]))
        e = leaf.setdefault(k, [0, 0])
        e[0 if r["l_returnflag"] == "N" else 1] += c
    assert len({ch for ch, _ in leaf}) == 5, "expected all five channels"
    profits = [s - t for s, t in leaf.values()]
    assert min(profits) < 0 < max(profits), "profit sign edge not forced"
    expected: dict[tuple, tuple] = {}
    for (ch, nat), (s, t) in leaf.items():
        expected[(ch, nat, 0)] = (s, t, s - t)
    for ch in {c for c, _ in leaf}:
        s = sum(v[0] for k, v in leaf.items() if k[0] == ch)
        t = sum(v[1] for k, v in leaf.items() if k[0] == ch)
        expected[(ch, None, 1)] = (s, t, s - t)
    gs = sum(v[0] for v in leaf.values())
    gt = sum(v[1] for v in leaf.values())
    expected[(None, None, 2)] = (gs, gt, gs - gt)
    got = {
        (r["ch"], r["nationkey"], r["lochierarchy"]): (
            r["sales_cents"], r["ret_cents"], r["profit_cents"]
        )
        for r in all_queries()["tpcds_q5"].build(spark, SF).collect()
    }
    assert got == expected and expected


def test_tpcds_q93_adjustment_edges_and_topk(spark):
    """Recompute the q93 returns adjustment in pure Python: sold/ret
    order-grain cells, GREATEST(sold - COALESCE(ret, 0), 0) per
    order, per-customer sums, and the (act_cents DESC, custkey ASC)
    top-100 head.  Edge forcing: the fixture must hold UNMATCHED
    orders (COALESCE path), CLAMPED orders (ret > sold, net
    pinned at 0), and PARTIALLY adjusted orders — all three — and
    the top-100 must EXCLUDE at least one customer (the limit does
    real work)."""
    li = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_quantity",
                "l_extendedprice", "l_discount")
        .collect()
    )
    ocust = {
        r["o_orderkey"]: r["o_custkey"]
        for r in load_table(spark, SF, "orders")
        .select("o_orderkey", "o_custkey").collect()
    }
    sold: dict[int, list[int]] = {}
    rets: dict[int, list[int]] = {}
    for r in li:
        if r["l_returnflag"] not in ("N", "R"):
            continue
        tgt = sold if r["l_returnflag"] == "N" else rets
        e = tgt.setdefault(r["l_orderkey"], [0, 0])
        e[0] += _cents(r["l_extendedprice"] * (1 - r["l_discount"]))
        e[1] += int(r["l_quantity"])
    unmatched = clamped = partial = 0
    per_cust: dict[int, list[int]] = {}
    for ok, (sc, sq) in sold.items():
        if ok not in rets:
            unmatched += 1
            rc = rq = 0
        else:
            rc, rq = rets[ok]
            if rc > sc:
                clamped += 1
            else:
                partial += 1
        e = per_cust.setdefault(ocust[ok], [0, 0, 0])
        e[0] += max(sc - rc, 0)
        e[1] += max(sq - rq, 0)
        e[2] += 1
    assert unmatched and clamped and partial, (
        f"adjustment edges not all forced: {unmatched}/{clamped}/{partial}"
    )
    assert len(per_cust) > 100, "limit would not exclude anyone"
    head = sorted(
        per_cust.items(), key=lambda kv: (-kv[1][0], kv[0])
    )[:100]
    expected = {c: tuple(v) for c, v in head}
    got = {
        r["custkey"]: (r["act_cents"], r["act_qty"], r["n_orders"])
        for r in all_queries()["tpcds_q93"].build(spark, SF).collect()
    }
    assert got == expected and len(got) == 100


def test_tpcds_q39_variance_cells_and_rollover(spark):
    """Recompute the q39 second-moment algebra in pure Python: the
    (supplier, month) integer moments (n, sum q, sum q^2), the cov
    threshold 4*n*(n*s2 - s1^2) > (n-1)*s1^2, and the
    consecutive-month pairing with the December->January rollover.
    Edge forcing: the fixture must hold n=1 cells (excluded), n>1
    cells FAILING the threshold, surviving pairs, and at least one
    pair CROSSING a year boundary (the m+89 arm)."""
    li = (
        load_table(spark, SF, "lineitem")
        .select("l_suppkey", "l_shipdate", "l_quantity")
        .collect()
    )
    snat = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in load_table(spark, SF, "supplier")
        .select("s_suppkey", "s_nationkey").collect()
    }
    cells: dict[tuple, list[int]] = {}
    for r in li:
        m = r["l_shipdate"].year * 100 + r["l_shipdate"].month
        q = int(r["l_quantity"])
        e = cells.setdefault((r["l_suppkey"], m), [0, 0, 0])
        e[0] += 1
        e[1] += q
        e[2] += q * q
    singletons = sum(1 for v in cells.values() if v[0] == 1)
    kept = {
        k: tuple(v)
        for k, v in cells.items()
        if v[0] > 1
        and 4 * v[0] * (v[0] * v[2] - v[1] * v[1])
        > (v[0] - 1) * v[1] * v[1]
    }
    failing = sum(1 for v in cells.values() if v[0] > 1) - len(kept)
    assert singletons and failing and kept, (
        f"threshold edges not all forced: {singletons}/{failing}/{len(kept)}"
    )
    expected: dict[tuple, tuple] = {}
    boundary = 0
    for (sk, m), v in kept.items():
        m2 = m + 89 if m % 100 == 12 else m + 1
        if (sk, m2) in kept:
            if m % 100 == 12:
                boundary += 1
            expected[(sk, m)] = (
                snat[sk], m, m2, *v, *kept[(sk, m2)]
            )
    assert boundary, "no December->January rollover pair in fixture"
    got = {
        (r["suppkey"], r["m1"]): (
            r["nationkey"], r["m1"], r["m2"],
            r["n1"], r["sumq1"], r["sumsq1"],
            r["n2"], r["sumq2"], r["sumsq2"],
        )
        for r in all_queries()["tpcds_q39"].build(spark, SF).collect()
    }
    assert got == expected and expected


def test_tpcds_q49_dual_rank_or_keep(spark):
    """Recompute the q49 dual ranking in pure Python: (channel, part)
    quantity/cents return ratios as IEEE doubles of the exact integer
    operands, both per-channel ranks through the total
    (ratio DESC, pk ASC) order, the OR<=10 keep.  Edge forcing: rows
    kept by the RETURN rank alone, rows kept by the CURRENCY rank
    alone, dropped rows, and all five channels must all be present."""
    li = (
        load_table(spark, SF, "lineitem")
        .where(F.col("l_returnflag").isin("N", "R"))
        .select("l_orderkey", "l_partkey", "l_returnflag",
                "l_quantity", "l_extendedprice", "l_discount")
        .collect()
    )
    och = {
        r["o_orderkey"]: r["o_orderpriority"][0]
        for r in load_table(spark, SF, "orders")
        .select("o_orderkey", "o_orderpriority").collect()
    }
    cell: dict[tuple, list[int]] = {}
    for r in li:
        k = (och[r["l_orderkey"]], r["l_partkey"])
        e = cell.setdefault(k, [0, 0, 0, 0])
        i = 0 if r["l_returnflag"] == "N" else 1
        e[i] += int(r["l_quantity"])
        e[2 + i] += _cents(r["l_extendedprice"] * (1 - r["l_discount"]))
    cell = {k: v for k, v in cell.items() if v[0] > 0 and v[1] > 0}
    assert len({ch for ch, _ in cell}) == 5, "expected all five channels"
    rrank: dict[tuple, int] = {}
    crank: dict[tuple, int] = {}
    for ch in {c for c, _ in cell}:
        mem = [(pk, v) for (c, pk), v in cell.items() if c == ch]
        for tgt, ratio in (
            (rrank, lambda v: v[1] / v[0]),
            (crank, lambda v: v[3] / v[2]),
        ):
            for i, (pk, _) in enumerate(
                sorted(mem, key=lambda e: (-ratio(e[1]), e[0]))
            ):
                tgt[(ch, pk)] = i + 1
    keep = {k for k in cell if rrank[k] <= 10 or crank[k] <= 10}
    rr_only = sum(1 for k in keep if crank[k] > 10)
    cr_only = sum(1 for k in keep if rrank[k] > 10)
    assert rr_only and cr_only and len(keep) < len(cell), (
        f"keep-direction edges not forced: {rr_only}/{cr_only}"
    )
    expected = {
        k: (cell[k][1] / cell[k][0], cell[k][3] / cell[k][2],
            rrank[k], crank[k])
        for k in keep
    }
    got = {
        (r["ch"], r["partkey"]): (
            r["return_ratio"], r["currency_ratio"],
            r["return_rank"], r["currency_rank"],
        )
        for r in all_queries()["tpcds_q49"].build(spark, SF).collect()
    }
    assert got == expected and expected
