"""TPC-DS-lite (r15 verdict #8, grown r17): TPC-DS query SHAPES
adapted to the driver testdata's TPC-H-ish star schema.  TPC-H is
22/22 since r11; these add the plan shapes TPC-H does not exercise —
grouping-set + window composition (Q36), deviation-from-window-average
with LAG/LEAD (Q47), two-channel FULL OUTER + cumulative windows
(Q51), bucket-HAVING + join-back (Q34), windowed group-average
comparison over a CTE (Q1), a battery of independent scalar
subqueries (Q88), cross-channel INTERSECT + join-back (Q14, r17),
rollup + windowed top-k per group (Q67, r17), per-channel
anti-join + cross-channel ratio comparison (Q78, r17), frequent-entity
INTERSECT sets + scalar-aggregate threshold (Q23, r18), the
consecutive-year multi-fact chain (Q64, r18), multi-channel UNION
rollup (Q5, r18), the returns-adjusted fact (Q93, r18), the
second-moment variance filter + consecutive-month self-join (Q39,
r18), and the dual-rank worst-performers OR-keep (Q49, r18).

ADAPTATIONS (no store/catalog/web channels, date_dim, or item here):
channels derive from o_orderpriority / l_returnflag slices; months
from year(ts)*100+month(ts); item hierarchy from p_brand/p_type;
returns from l_returnflag = 'R'.  Each query keeps the ORIGINAL's
operator shape — the thing the reference suite cares about — with an
exact DuckDB oracle.

Exactness discipline: money through integer cents
(floor(x*100 + 0.5)), deviation thresholds as integer
cross-multiplications (10*cents*n < 9*tot, never AVG), every windowed
DuckDB SUM cast back from HUGEINT, GROUPING() cast to INT both sides,
ratios as double-of-exact-int divisions (identical operands both
engines).

Reference parity: SURVEY.md §2.4/§2.6 composition
(host/aggr/aggr_native.cc partial->final, host/join/join_dpu.cc
PK-FK) exercised through deeper multi-fact plans.
"""

from __future__ import annotations

import itertools

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dpu_olap_spark.registry import query
from dpu_olap_spark.sources.tables import load_table


def _cents(col: Column) -> Column:
    """Exact integer cents: floor(x*100 + 0.5), the registry-wide
    half-up spelling (pandas .round / CAST would diverge)."""
    return F.floor(col * 100 + 0.5).cast("bigint")


def _yyyymm(col: str) -> Column:
    return (F.year(col) * 100 + F.month(col)).cast("bigint")


def _wide(col: Column) -> Column:
    """DECIMAL(38,0) widening for the threshold cross-multiplications
    (5*x*n > 6*sum and friends).  In BIGINT those products can exceed
    2^63 at extreme scale, where non-ANSI Spark wraps silently while
    DuckDB raises — a silent-divergence class the oracle can't catch
    at tested SFs.  DECIMAL(38,0) here, mirrored by CAST(... AS
    HUGEINT) in the oracles, keeps the comparison exact to 10^38:
    a 100 TB fact is ~10^12 rows x ~10^4 cents = 10^16 total cents,
    and 10 * 10^16 * 10^10 group rows = 10^27 << 10^38."""
    return col.cast("decimal(38,0)")


# ---------------------------------------------------------------------------
# Q1 shape: CTE of per-customer channel totals, keep customers above
# 1.2x their group's average, via window aggregates (never AVG — the
# threshold is the integer cross-multiplication 5*x*n > 6*sum).
# ---------------------------------------------------------------------------


@query(
    "tpcds_q1",
    oracle="""
    WITH ctr AS (
      SELECT c.c_custkey, c.c_nationkey,
             CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                    * 100 + 0.5) AS BIGINT)) AS BIGINT) AS ret_cents
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE l.l_returnflag = 'R'
      GROUP BY c.c_custkey, c.c_nationkey
    )
    SELECT c_custkey, ret_cents
    FROM (
      SELECT c_custkey, ret_cents,
             CAST(SUM(ret_cents) OVER (PARTITION BY c_nationkey)
                  AS BIGINT) AS nat_cents,
             COUNT(*) OVER (PARTITION BY c_nationkey) AS nat_n
      FROM ctr
    ) t
    WHERE 5 * CAST(ret_cents AS HUGEINT) * nat_n
        > 6 * CAST(nat_cents AS HUGEINT)
    """,
)
def q_tpcds_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q1 shape — customers whose returned revenue exceeds
    1.2x their nation's average returner.  The average never
    materializes: 5*x*n > 6*sum keeps the comparison in exact
    integers (the rule-9 discipline, widened per _wide), computed by
    window aggregates over the customer-level CTE so the fact is
    aggregated exactly once.

    Scale: the fact collapses to one row per returning customer
    before the window; the window shuffles customer-level rows keyed
    by nation (25 partitions of ~|customers|/25), never the fact."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    ctr = (
        li.select(
            "l_orderkey",
            _cents(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("rc"),
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.sum("rc").cast("bigint").alias("ret_cents"))
    )
    w = Window.partitionBy("c_nationkey")
    return (
        ctr.select(
            "c_custkey",
            "ret_cents",
            F.sum("ret_cents").over(w).cast("bigint").alias("nat_cents"),
            F.count(F.lit(1)).over(w).alias("nat_n"),
        )
        .where(
            5 * _wide(F.col("ret_cents")) * F.col("nat_n")
            > 6 * _wide(F.col("nat_cents"))
        )
        .select("c_custkey", "ret_cents")
    )


# ---------------------------------------------------------------------------
# Q34/Q73 shape: orders whose line count lands in a bucket (grouped
# HAVING BETWEEN), joined back to the customer dimension.
# ---------------------------------------------------------------------------


@query(
    "tpcds_q34",
    oracle="""
    WITH oc AS (
      SELECT o.o_orderkey, o.o_custkey, COUNT(*) AS n_lines
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY o.o_orderkey, o.o_custkey
      HAVING COUNT(*) BETWEEN 7 AND 13
    )
    SELECT c.c_custkey, c.c_name, oc.o_orderkey, oc.n_lines
    FROM oc JOIN customer c ON oc.o_custkey = c.c_custkey
    """,
)
def q_tpcds_q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q34 shape — big-basket orders (7-13 lines) by urgent
    customers.  The HAVING prunes the fact-level aggregate BEFORE the
    dimension join, so the join probes only bucket survivors; the
    customer side broadcasts."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    oc = (
        o.select("o_orderkey", "o_custkey")
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .where(F.col("n_lines").between(7, 13))
    )
    return oc.join(
        F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")
    ).select("c_custkey", "c_name", "o_orderkey", "n_lines")


# ---------------------------------------------------------------------------
# Q36 shape: margin over a ROLLUP hierarchy with GROUPING()
# indicators and RANK within the parent grouping level.
# ---------------------------------------------------------------------------


@query(
    "tpcds_q36",
    oracle="""
    WITH f AS (
      SELECT p.p_brand, p.p_type,
             CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                  * 100 + 0.5) AS BIGINT) AS rev_c,
             CAST(floor(p.p_retailprice * l.l_quantity
                  * 100 + 0.5) AS BIGINT) AS cost_c
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    g AS (
      SELECT p_brand, p_type,
             CAST(GROUPING(p_brand) AS INT)
               + CAST(GROUPING(p_type) AS INT) AS lochierarchy,
             CAST(GROUPING(p_type) AS INT) AS g_type,
             CAST(SUM(rev_c) AS BIGINT) AS rev_cents,
             CAST(SUM(cost_c) AS BIGINT) AS cost_cents
      FROM f GROUP BY ROLLUP(p_brand, p_type)
      HAVING COUNT(*) > 0
    )
    SELECT p_brand, p_type, lochierarchy, rev_cents, cost_cents,
           RANK() OVER (
             PARTITION BY lochierarchy,
                          CASE WHEN g_type = 0 THEN p_brand END
             ORDER BY CAST(rev_cents AS DOUBLE)
                      / CAST(cost_cents AS DOUBLE) ASC
           ) AS rank_within_parent
    FROM g
    """,
)
def q_tpcds_q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q36 shape — gross-margin ranking through a ROLLUP
    hierarchy (type within brand within grand total), RANK partitioned
    by the GROUPING level so each row ranks among its PARENT's
    children.  The margin ratio divides two exact BIGINT sums as
    doubles — identical operands on both engines, so equal ratios tie
    identically and RANK agrees.  HAVING COUNT(*) > 0 is the house
    empty-rollup guard (DuckDB emits the () row over empty input,
    Spark does not).

    Scale: the rollup is a map-side-combinable aggregate over ~150
    (brand, type) cells x 3 levels; the window input is the bounded
    cell table, never the fact."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type", "p_retailprice"
    )
    f = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).select(
        "p_brand",
        "p_type",
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev_c"
        ),
        _cents(F.col("p_retailprice") * F.col("l_quantity")).alias("cost_c"),
    )
    g = (
        f.rollup("p_brand", "p_type")
        .agg(
            (
                F.grouping("p_brand").cast("int")
                + F.grouping("p_type").cast("int")
            ).alias("lochierarchy"),
            F.grouping("p_type").cast("int").alias("g_type"),
            F.sum("rev_c").cast("bigint").alias("rev_cents"),
            F.sum("cost_c").cast("bigint").alias("cost_cents"),
            F.count(F.lit(1)).alias("_n"),
        )
        .where(F.col("_n") > 0)
    )
    w = Window.partitionBy(
        "lochierarchy",
        F.when(F.col("g_type") == 0, F.col("p_brand")),
    ).orderBy(
        (
            F.col("rev_cents").cast("double")
            / F.col("cost_cents").cast("double")
        ).asc()
    )
    return g.select(
        "p_brand",
        "p_type",
        "lochierarchy",
        "rev_cents",
        "cost_cents",
        F.rank().over(w).alias("rank_within_parent"),
    )


# ---------------------------------------------------------------------------
# Q47/Q57 shape: monthly series per brand, months below 90% of the
# brand average, with the neighbors via LAG/LEAD.
# ---------------------------------------------------------------------------


@query(
    "tpcds_q47",
    oracle="""
    WITH m AS (
      SELECT p.p_brand AS brand,
             CAST(year(l.l_shipdate) * 100 + month(l.l_shipdate)
                  AS BIGINT) AS yyyymm,
             CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5)
                  AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    w AS (
      SELECT brand, yyyymm, cents,
             CAST(SUM(cents) OVER (PARTITION BY brand) AS BIGINT) AS tot,
             COUNT(*) OVER (PARTITION BY brand) AS nm,
             LAG(cents) OVER (PARTITION BY brand ORDER BY yyyymm ASC)
               AS prev_cents,
             LEAD(cents) OVER (PARTITION BY brand ORDER BY yyyymm ASC)
               AS next_cents
      FROM m
    )
    SELECT brand, yyyymm, cents, prev_cents, next_cents
    FROM w
    WHERE 10 * CAST(cents AS HUGEINT) * nm < 9 * CAST(tot AS HUGEINT)
    """,
)
def q_tpcds_q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q47 shape — brand-months whose revenue falls below 90%
    of the brand's monthly average, reported with the neighboring
    months (LAG/LEAD).  The average is never computed:
    10*cents*nm < 9*tot is the exact integer form.  yyyymm is unique
    within a brand, so the LAG/LEAD order is total (no tie hazard).

    Scale: the fact collapses to brand x month (~2,000 rows) in one
    map-combinable aggregate; all four windows share one
    (brand)-partitioned sort of that bounded table."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    m = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.col("p_brand").alias("brand"),
            _yyyymm("l_shipdate").alias("yyyymm"),
            _cents(F.col("l_extendedprice")).alias("rc"),
        )
        .groupBy("brand", "yyyymm")
        .agg(F.sum("rc").cast("bigint").alias("cents"))
    )
    order = Window.partitionBy("brand").orderBy(F.col("yyyymm").asc())
    whole = Window.partitionBy("brand")
    w = m.select(
        "brand",
        "yyyymm",
        "cents",
        F.sum("cents").over(whole).cast("bigint").alias("tot"),
        F.count(F.lit(1)).over(whole).alias("nm"),
        F.lag("cents").over(order).alias("prev_cents"),
        F.lead("cents").over(order).alias("next_cents"),
    )
    return w.where(
        10 * _wide(F.col("cents")) * F.col("nm") < 9 * _wide(F.col("tot"))
    ).select(
        "brand", "yyyymm", "cents", "prev_cents", "next_cents"
    )


# ---------------------------------------------------------------------------
# Q51 shape: two channels FULL OUTER joined on the period key, then
# cumulative sums compared.
# ---------------------------------------------------------------------------


@query(
    "tpcds_q51",
    oracle="""
    WITH ord AS (
      SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate)
                  AS BIGINT) AS mo,
             CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY 1
    ),
    ret AS (
      SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate)
                  AS BIGINT) AS mo,
             CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem WHERE l_returnflag = 'R'
      GROUP BY 1
    ),
    j AS (
      SELECT COALESCE(o.mo, r.mo) AS mo,
             COALESCE(o.cents, 0) AS ord_cents,
             COALESCE(r.cents, 0) AS ret_cents
      FROM ord o FULL JOIN ret r ON o.mo = r.mo
    ),
    c AS (
      SELECT mo,
             CAST(SUM(ord_cents) OVER (ORDER BY mo ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_ord,
             CAST(SUM(ret_cents) OVER (ORDER BY mo ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_ret
      FROM j
    )
    SELECT mo, cum_ord, cum_ret
    FROM c WHERE 3 * CAST(cum_ret AS HUGEINT) > 2 * CAST(cum_ord AS HUGEINT)
    """,
)
def q_tpcds_q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q51 shape — two independent channel aggregates (urgent
    order revenue vs returned line revenue) FULL OUTER joined on the
    month, cumulative sums over the spliced series, months where the
    returns trend crosses 2/3 of the orders trend.  COALESCE makes
    the month key and both measures total before the windows (the
    null-safe splice is the shape's point).

    Scale: both channels collapse to <=84 month rows before the FULL
    OUTER join and the single-partition cumulative window — bounded
    by the calendar, not the fact, so the one-partition window is
    safe at any fact size."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    ord_m = (
        o.select(
            _yyyymm("o_orderdate").alias("mo"),
            _cents(F.col("o_totalprice")).alias("oc"),
        )
        .groupBy("mo")
        .agg(F.sum("oc").cast("bigint").alias("cents"))
    )
    ret_m = (
        li.select(
            _yyyymm("l_shipdate").alias("mo"),
            _cents(F.col("l_extendedprice")).alias("rc"),
        )
        .groupBy("mo")
        .agg(F.sum("rc").cast("bigint").alias("cents"))
    )
    j = (
        ord_m.alias("o")
        .join(ret_m.alias("r"), F.col("o.mo") == F.col("r.mo"), "full_outer")
        .select(
            F.coalesce(F.col("o.mo"), F.col("r.mo")).alias("mo"),
            F.coalesce(F.col("o.cents"), F.lit(0)).alias("ord_cents"),
            F.coalesce(F.col("r.cents"), F.lit(0)).alias("ret_cents"),
        )
    )
    cum = Window.orderBy(F.col("mo").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = j.select(
        "mo",
        F.sum("ord_cents").over(cum).cast("bigint").alias("cum_ord"),
        F.sum("ret_cents").over(cum).cast("bigint").alias("cum_ret"),
    )
    return c.where(3 * _wide(F.col("cum_ret")) > 2 * _wide(F.col("cum_ord")))


# ---------------------------------------------------------------------------
# Q88 shape: a battery of independent scalar-subquery counts in one
# SELECT — the multi-scan plan TPC-H never produces.
# ---------------------------------------------------------------------------

_q88_view_counter = itertools.count()

_Q88_SQL = """
SELECT
  (SELECT COUNT(*) FROM {li} WHERE CAST(floor(l_quantity + 0.5) AS BIGINT)
     BETWEEN 1 AND 10
     AND CAST(floor(l_discount * 100 + 0.5) AS BIGINT) <= 2) AS b1,
  (SELECT COUNT(*) FROM {li} WHERE CAST(floor(l_quantity + 0.5) AS BIGINT)
     BETWEEN 11 AND 20
     AND CAST(floor(l_discount * 100 + 0.5) AS BIGINT) <= 4) AS b2,
  (SELECT COUNT(*) FROM {li} WHERE CAST(floor(l_quantity + 0.5) AS BIGINT)
     BETWEEN 21 AND 30
     AND CAST(floor(l_tax * 100 + 0.5) AS BIGINT) >= 4) AS b3,
  (SELECT COUNT(*) FROM {li} WHERE CAST(floor(l_quantity + 0.5) AS BIGINT)
     BETWEEN 31 AND 40
     AND l_returnflag = 'R') AS b4,
  (SELECT COUNT(*) FROM {li} WHERE CAST(floor(l_quantity + 0.5) AS BIGINT)
     BETWEEN 41 AND 50
     AND l_linestatus = 'F') AS b5,
  (SELECT COUNT(*) FROM {li} WHERE CAST(floor(l_discount * 100 + 0.5)
     AS BIGINT) >= 8 AND l_returnflag = 'A') AS b6
"""


@query("tpcds_q88", oracle=_Q88_SQL.format(li="lineitem"))
def q_tpcds_q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q88 shape — six independent banded counts as scalar
    subqueries in a single one-row SELECT.  Each band is an
    integer-exact predicate (quantity/discount/tax through the cents
    spelling).  Spark plans the six as independent subquery stages
    over the shared scan; there is no join, cartesian or otherwise.

    Scale: six parallel aggregates over one table — each is a
    map-side count, the combine is 6 scalars."""
    # Counter-suffixed view name (the stream-sink convention): fixed
    # names let concurrent builds against different sf_dirs overwrite
    # each other's view and leak it past the query's lifetime.
    view = f"tpcds_q88_lineitem_{next(_q88_view_counter)}"
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(view)
    df = spark.sql(_Q88_SQL.format(li=view))
    spark.catalog.dropTempView(view)
    return df


# ---------------------------------------------------------------------------
# Q14 shape (r17): entities present in ALL sales channels via
# INTERSECT, joined back for per-channel reporting — the cross-channel
# set-intersection plan TPC-H never produces.
# ---------------------------------------------------------------------------


@query(
    "tpcds_q14",
    oracle="""
    WITH sm AS (
      SELECT l_suppkey AS sk,
             CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS mo,
             l_returnflag AS channel,
             CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                  * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
             COUNT(*) AS n_lines
      FROM lineitem
      GROUP BY 1, 2, 3
    ),
    x AS (
      SELECT sk, mo FROM sm WHERE channel = 'A'
      INTERSECT
      SELECT sk, mo FROM sm WHERE channel = 'N'
      INTERSECT
      SELECT sk, mo FROM sm WHERE channel = 'R'
    )
    SELECT s.s_nationkey AS nationkey, sm.mo, sm.channel,
           CAST(SUM(sm.cents) AS BIGINT) AS cents,
           CAST(SUM(sm.n_lines) AS BIGINT) AS n_lines
    FROM sm
    JOIN x ON sm.sk = x.sk AND sm.mo = x.mo
    JOIN supplier s ON sm.sk = s.s_suppkey
    GROUP BY 1, 2, 3
    """,
)
def q_tpcds_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q14 shape — supplier-months active in ALL THREE return
    channels (the INTERSECT of per-channel key sets), reported per
    (nation, month, channel).  The original intersects item sets
    across store/catalog/web sales; here channels are the
    l_returnflag slices (the house adaptation) and the key is
    (supplier, month) — probed non-degenerate at every SF (sf0.001:
    605 of 826 supplier-months survive; sf0.1: 62,529 of 82,531).

    Scale: the fact collapses ONCE to (supplier, month, channel)
    cells in a map-combinable aggregate; the INTERSECT runs over
    per-channel projections of that bounded table (distinct + semi
    joins, never the fact); the join-back keys two aggregated tables
    on (sk, mo); the supplier dim broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    sm = (
        li.select(
            F.col("l_suppkey").alias("sk"),
            _yyyymm("l_shipdate").alias("mo"),
            F.col("l_returnflag").alias("channel"),
            _cents(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("rc"),
        )
        .groupBy("sk", "mo", "channel")
        .agg(
            F.sum("rc").cast("bigint").alias("cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )

    def chan(flag: str) -> DataFrame:
        return sm.where(F.col("channel") == flag).select("sk", "mo")

    x = chan("A").intersect(chan("N")).intersect(chan("R"))
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    return (
        sm.join(x, ["sk", "mo"])
        .join(F.broadcast(s), F.col("sk") == F.col("s_suppkey"))
        .groupBy(
            F.col("s_nationkey").alias("nationkey"), F.col("mo"), F.col("channel")
        )
        .agg(
            F.sum("cents").cast("bigint").alias("cents"),
            F.sum("n_lines").cast("bigint").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q67 shape (r17): top-k per group over a ROLLUP hierarchy — the
# windowed-k filter over grouping-set output TPC-H never produces.
# ---------------------------------------------------------------------------


@query(
    "tpcds_q67",
    oracle="""
    WITH g AS (
      SELECT p.p_brand, p.p_type,
             CAST(year(l.l_shipdate) * 100 + month(l.l_shipdate)
                  AS BIGINT) AS mo,
             CAST(GROUPING(p.p_type) AS INT) AS g_type,
             CAST(GROUPING(mo) AS INT) AS g_mo,
             CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                  * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sumsales
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY ROLLUP(p.p_brand, p.p_type, mo)
      HAVING COUNT(*) > 0
    ),
    r AS (
      SELECT p_brand, p_type, mo, g_type, g_mo, sumsales,
             RANK() OVER (
               PARTITION BY p_brand
               ORDER BY sumsales DESC, g_type ASC, g_mo ASC,
                        p_type ASC NULLS LAST, mo ASC NULLS LAST
             ) AS rk
      FROM g
    )
    SELECT p_brand, p_type, mo, g_type, g_mo, sumsales, rk
    FROM r WHERE rk <= 5
    """,
)
def q_tpcds_q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q67 shape — top-5 sales cells per brand across EVERY
    level of the ROLLUP(brand, type, month) hierarchy at once (month
    cells compete with their own type subtotal and the brand total;
    the all-NULL grand-total row is its own partition).  The original
    ranks rollup output within i_category; the rank order is made
    TOTAL (sumsales, grouping flags, then the nullable keys with
    spelled NULLS LAST) so RANK agrees across engines — within a
    brand no two rows share all five keys.

    Scale: the rollup is one map-combinable Expand aggregate over
    ~12.6k bounded cells; the window reads that bounded table
    partitioned by brand — never the fact."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type")
    g = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_brand",
            "p_type",
            _yyyymm("l_shipdate").alias("mo"),
            _cents(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("rc"),
        )
        .rollup("p_brand", "p_type", "mo")
        .agg(
            F.grouping("p_type").cast("int").alias("g_type"),
            F.grouping("mo").cast("int").alias("g_mo"),
            F.sum("rc").cast("bigint").alias("sumsales"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .where(F.col("n_rows") > 0)
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.col("sumsales").desc(),
        F.col("g_type").asc(),
        F.col("g_mo").asc(),
        F.col("p_type").asc_nulls_last(),
        F.col("mo").asc_nulls_last(),
    )
    return (
        g.select(
            "p_brand", "p_type", "mo", "g_type", "g_mo", "sumsales",
            F.rank().over(w).alias("rk"),
        )
        .where(F.col("rk") <= 5)
    )


# ---------------------------------------------------------------------------
# Q78 shape (r17): per-channel aggregates over NEVER-RETURNED entities
# (anti-join inside each channel) compared across channels — the
# anti-join + multi-channel ratio plan TPC-H never produces.
# ---------------------------------------------------------------------------


@query(
    "tpcds_q78",
    oracle="""
    WITH ret AS (
      SELECT DISTINCT l_partkey FROM lineitem
      WHERE l_returnflag = 'R'
        AND CAST(floor(l_discount * 100 + 0.5) AS BIGINT) >= 8
    ),
    ch1 AS (
      SELECT l.l_partkey AS pk, CAST(year(o.o_orderdate) AS BIGINT) AS yr,
             CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                  * 100 + 0.5) AS BIGINT)) AS BIGINT) AS urgent_cents,
             COUNT(*) AS urgent_lines
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        AND NOT EXISTS (SELECT 1 FROM ret WHERE ret.l_partkey = l.l_partkey)
      GROUP BY 1, 2
    ),
    ch2 AS (
      SELECT l.l_partkey AS pk, CAST(year(o.o_orderdate) AS BIGINT) AS yr,
             CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                  * 100 + 0.5) AS BIGINT)) AS BIGINT) AS other_cents,
             COUNT(*) AS other_lines
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        AND NOT EXISTS (SELECT 1 FROM ret WHERE ret.l_partkey = l.l_partkey)
      GROUP BY 1, 2
    )
    SELECT ch1.pk, ch1.yr, ch1.urgent_cents, ch1.urgent_lines,
           ch2.other_cents, ch2.other_lines
    FROM ch1 JOIN ch2 ON ch1.pk = ch2.pk AND ch1.yr = ch2.yr
    WHERE 2 * CAST(ch1.urgent_cents AS HUGEINT) > CAST(ch2.other_cents AS HUGEINT)
    """,
)
def q_tpcds_q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q78 shape — per-(part, year) revenue from TWO order
    channels (urgent vs other priorities), each restricted to parts
    NEVER returned at a deep discount (the anti-join), then the
    channels joined and kept where urgent revenue exceeds half the
    other channel's (_wide-widened cross-multiplication).  The
    original anti-joins each sales channel against its returns table
    and compares store vs web ratios.  Probed non-degenerate at every
    SF (sf0.001: 85 joined part-years, 55 survive the ratio; sf0.1:
    8,063 / 5,271).

    Scale: the returned-parts set is a DISTINCT projection of a
    pushed-down fact filter (bounded by |part|, broadcastable); both
    channel aggregates anti-join the fact BEFORE aggregating (a
    broadcast anti-join per channel, no shuffle added); the channel
    join keys two aggregated tables on (pk, yr)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    ret = (
        li.where(
            (F.col("l_returnflag") == "R")
            & (F.floor(F.col("l_discount") * 100 + 0.5).cast("bigint") >= 8)
        )
        .select("l_partkey")
        .distinct()
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")

    def channel(pred, cents_name: str, lines_name: str) -> DataFrame:
        return (
            li.join(F.broadcast(ret), "l_partkey", "left_anti")
            .join(o.where(pred), F.col("l_orderkey") == F.col("o_orderkey"))
            .select(
                F.col("l_partkey").alias("pk"),
                F.year("o_orderdate").cast("bigint").alias("yr"),
                _cents(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).alias("rc"),
            )
            .groupBy("pk", "yr")
            .agg(
                F.sum("rc").cast("bigint").alias(cents_name),
                F.count(F.lit(1)).alias(lines_name),
            )
        )

    ch1 = channel(urgent, "urgent_cents", "urgent_lines")
    ch2 = channel(~urgent, "other_cents", "other_lines")
    return (
        ch1.join(ch2, ["pk", "yr"])
        .where(2 * _wide(F.col("urgent_cents")) > _wide(F.col("other_cents")))
        .select(
            "pk", "yr", "urgent_cents", "urgent_lines",
            "other_cents", "other_lines",
        )
    )


# ---------------------------------------------------------------------------
# Q58 shape (r17): three aggregates of the SAME fact (one per channel)
# inner-joined on the entity key and compared against their own
# cross-channel average — the N-way self-aggregate join TPC-H never
# produces.
# ---------------------------------------------------------------------------


@query(
    "tpcds_q58",
    oracle="""
    WITH bc AS (
      SELECT l_partkey AS pk, l_returnflag AS ch,
             CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                  * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem GROUP BY 1, 2
    ),
    a AS (SELECT pk, cents FROM bc WHERE ch = 'A'),
    n AS (SELECT pk, cents FROM bc WHERE ch = 'N'),
    r AS (SELECT pk, cents FROM bc WHERE ch = 'R')
    SELECT a.pk, a.cents AS a_cents, n.cents AS n_cents, r.cents AS r_cents
    FROM a JOIN n ON a.pk = n.pk JOIN r ON n.pk = r.pk
    WHERE 15 * CAST(a.cents AS HUGEINT)
            BETWEEN 4 * CAST(a.cents + n.cents + r.cents AS HUGEINT)
                AND 6 * CAST(a.cents + n.cents + r.cents AS HUGEINT)
      AND 15 * CAST(n.cents AS HUGEINT)
            BETWEEN 4 * CAST(a.cents + n.cents + r.cents AS HUGEINT)
                AND 6 * CAST(a.cents + n.cents + r.cents AS HUGEINT)
      AND 15 * CAST(r.cents AS HUGEINT)
            BETWEEN 4 * CAST(a.cents + n.cents + r.cents AS HUGEINT)
                AND 6 * CAST(a.cents + n.cents + r.cents AS HUGEINT)
    """,
)
def q_tpcds_q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q58 shape — parts whose revenue is BALANCED across all
    three return channels: the per-(part, channel) aggregate of one
    fact, split into three channel tables, inner-joined back on the
    part key, kept where every channel sits within ±20% of the
    cross-channel average (15*c BETWEEN 4*tot AND 6*tot in widened
    integers — never a float average).  The original joins three
    per-channel item aggregates and compares each to their avg.  The
    part grain keeps the filter biting at EVERY volume (the entity
    dimension grows with the fact, so per-cell channel shares stay
    noisy — fixed dims like brand converge to 1/3 by sf0.1 and the
    band stops selecting; probed: 48 of 200 survive at sf0.001,
    4,313 of 19,996 at sf0.1, and the 3-channel presence join also
    bites at sf0.1).

    Scale: ONE map-combinable fact aggregate to (part, channel)
    cells; the three channel tables are disjoint projections of that
    bounded table; the 3-way join keys aggregated tables on pk —
    never the fact."""
    li = load_table(spark, sf_dir, "lineitem")
    bc = (
        li.select(
            F.col("l_partkey").alias("pk"),
            F.col("l_returnflag").alias("ch"),
            _cents(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("rc"),
        )
        .groupBy("pk", "ch")
        .agg(F.sum("rc").cast("bigint").alias("cents"))
    )

    def chan(flag: str, out: str) -> DataFrame:
        return bc.where(F.col("ch") == flag).select(
            F.col("pk"), F.col("cents").alias(out)
        )

    j = (
        chan("A", "a_cents")
        .join(chan("N", "n_cents"), "pk")
        .join(chan("R", "r_cents"), "pk")
    )
    tot = _wide(F.col("a_cents") + F.col("n_cents") + F.col("r_cents"))
    cond = None
    for c in ("a_cents", "n_cents", "r_cents"):
        band = (15 * _wide(F.col(c)) >= 4 * tot) & (
            15 * _wide(F.col(c)) <= 6 * tot
        )
        cond = band if cond is None else (cond & band)
    return j.where(cond).select("pk", "a_cents", "n_cents", "r_cents")


# ---------------------------------------------------------------------------
# Q23 shape (r18): frequent-entity sets — an INTERSECT of two
# per-channel frequency sets AND a scalar-aggregate customer filter
# both pruning a third fact pass.  The original intersects frequent
# store items across years and filters to best customers above a
# scalar aggregate of per-customer sales.
# ---------------------------------------------------------------------------


@query(
    "tpcds_q23",
    oracle="""
    WITH pc AS (
      SELECT l_partkey, l_returnflag AS ch, COUNT(*) AS n
      FROM lineitem GROUP BY 1, 2
    ),
    freq AS (
      SELECT l_partkey FROM pc WHERE ch = 'N' AND n >= 12
      INTERSECT
      SELECT l_partkey FROM pc WHERE ch = 'A' AND n >= 12
    ),
    cs AS (
      SELECT o.o_custkey,
             CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                  * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1
    ),
    best AS (
      SELECT o_custkey FROM cs
      WHERE 10 * CAST(cents AS HUGEINT) * (SELECT COUNT(*) FROM cs)
          > 13 * (SELECT CAST(SUM(CAST(cents AS HUGEINT)) AS HUGEINT)
                  FROM cs)
    )
    SELECT CAST(year(l.l_shipdate) * 100 + month(l.l_shipdate)
                AS BIGINT) AS mo,
           CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
      AND l.l_partkey IN (SELECT l_partkey FROM freq)
      AND o.o_custkey IN (SELECT o_custkey FROM best)
    GROUP BY 1
    """,
)
def q_tpcds_q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q23 shape — the returned-channel revenue per month for
    FREQUENT parts bought by BEST customers: freq = the INTERSECT of
    two per-channel part-frequency sets (>= 12 lines in channel 'N'
    and in channel 'A'); best = customers whose lifetime spend
    exceeds 1.3x the per-customer average, the threshold a SCALAR
    aggregate over the per-customer aggregate itself (the original's
    max_store_sales pattern) as the widened integer
    cross-multiplication 10*cents*n_cust > 13*total_cents.  Both
    derived sets prune a third pass over the fact.

    Selectivity keys live on GROWTH dimensions (the r17 lesson):
    part frequency per channel is ~Poisson(10) at every SF (lines
    per part is volume-invariant), and per-customer spend is a
    ~40-line sample — probed: freq 19/200 parts, best 36/150
    customers, 56 final lines at sf0.001; 1,808/20,000, 2,979/15,000,
    5,303 at sf0.1 (constant proportions, the edges bite at every
    volume).

    Scale: the frequency sets come from ONE map-combinable
    (part, channel) count; the INTERSECT runs over bounded
    projections; the per-customer aggregate collapses the o-l join
    before the scalar compare (a 1-row broadcast on a literal key —
    BroadcastHashJoin, never a cartesian); the final pass semi-joins
    the fact to both key sets (left-semi shuffle joins on grown dims,
    the honest 100 TB plan) before the month rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    rc = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))

    pc = (
        li.groupBy(
            F.col("l_partkey"), F.col("l_returnflag").alias("ch")
        ).agg(F.count(F.lit(1)).alias("n"))
    )

    def freq_chan(flag: str) -> DataFrame:
        return pc.where((F.col("ch") == flag) & (F.col("n") >= 12)).select(
            "l_partkey"
        )

    freq = freq_chan("N").intersect(freq_chan("A"))

    cs = (
        li.select("l_orderkey", rc.alias("rc"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("rc").cast("bigint").alias("cents"))
    )
    tot = cs.agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum("cents").cast("bigint").alias("total_cents"),
    ).withColumn("k", F.lit(1))
    best = (
        cs.withColumn("k", F.lit(1))
        .join(F.broadcast(tot), "k")
        .where(
            10 * _wide(F.col("cents")) * F.col("n_cust")
            > 13 * _wide(F.col("total_cents"))
        )
        .select("o_custkey")
    )

    return (
        li.where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_partkey", "l_shipdate", rc.alias("rc"))
        .join(freq, "l_partkey", "left_semi")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(best, "o_custkey", "left_semi")
        .groupBy(_yyyymm("l_shipdate").alias("mo"))
        .agg(
            F.sum("rc").cast("bigint").alias("cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q64 shape (r18): multi-fact chain — two channel-derived fact
# aggregates self-joined across consecutive years on the same entity,
# kept where the cross-period ratio STRICTLY grew.  The original
# chains store_sales -> store_returns -> a re-sale through two date
# dims and compares the two years' prices per (item, store).
# ---------------------------------------------------------------------------


@query(
    "tpcds_q64",
    oracle="""
    WITH sold AS (
      SELECT l_suppkey AS sk, CAST(year(l_shipdate) AS BIGINT) AS y,
             CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                  * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem WHERE l_returnflag = 'N' GROUP BY 1, 2
    ),
    ret AS (
      SELECT l_suppkey AS sk, CAST(year(l_shipdate) AS BIGINT) AS y,
             CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                  * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1, 2
    )
    SELECT s1.sk AS suppkey, s.s_nationkey AS nationkey,
           s1.y AS y1, s2.y AS y2,
           s1.cents AS sold1, r1.cents AS ret1,
           s2.cents AS sold2, r2.cents AS ret2
    FROM sold s1
    JOIN sold s2 ON s1.sk = s2.sk AND s2.y = s1.y + 1
    JOIN ret r1 ON r1.sk = s1.sk AND r1.y = s1.y
    JOIN ret r2 ON r2.sk = s1.sk AND r2.y = s2.y
    JOIN supplier s ON s1.sk = s.s_suppkey
    WHERE CAST(r2.cents AS HUGEINT) * s1.cents
        > CAST(r1.cents AS HUGEINT) * s2.cents
    """,
)
def q_tpcds_q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q64 shape — a multi-fact chain: the sold ('N') and
    returned ('R') channel aggregates of the fact at (supplier, year)
    grain, FOUR of them chained on the same supplier across
    consecutive years, kept where the return share STRICTLY grew
    year-over-year — the widened integer cross-multiplication
    ret2*sold1 > ret1*sold2 (two cents totals multiply to ~10^32 at
    100 TB: BIGINT would wrap silently, DECIMAL(38,0)/HUGEINT keeps
    both engines exact).

    Supplier is a GROWTH dimension (the r17 lesson): lines per
    (supplier, year) stay ~86 at every SF, so each channel cell is a
    ~29-line sample and the strict-growth filter keeps selecting
    ~50% of chain pairs at every volume — probed: 31/60 pairs at
    sf0.001, 302/600 at sf0.01, 2,984/6,000 at sf0.1 (fixed dims
    would converge and the edge would die).

    Scale: both fact scans collapse ONCE to map-combined
    (supplier, year) cells; all four chain joins key the BOUNDED
    aggregate tables on (sk, y) — the fact is never re-shuffled; the
    supplier dim broadcasts for the nation label."""
    li = load_table(spark, sf_dir, "lineitem")
    rc = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))

    def chan(flag: str) -> DataFrame:
        return (
            li.where(F.col("l_returnflag") == flag)
            .select(
                F.col("l_suppkey").alias("sk"),
                F.year("l_shipdate").cast("bigint").alias("y"),
                rc.alias("rc"),
            )
            .groupBy("sk", "y")
            .agg(F.sum("rc").cast("bigint").alias("cents"))
        )

    sold, ret = chan("N"), chan("R")
    s1, s2 = sold.alias("s1"), sold.alias("s2")
    r1, r2 = ret.alias("r1"), ret.alias("r2")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    return (
        s1.join(
            s2,
            (F.col("s1.sk") == F.col("s2.sk"))
            & (F.col("s2.y") == F.col("s1.y") + 1),
        )
        .join(
            r1,
            (F.col("r1.sk") == F.col("s1.sk"))
            & (F.col("r1.y") == F.col("s1.y")),
        )
        .join(
            r2,
            (F.col("r2.sk") == F.col("s1.sk"))
            & (F.col("r2.y") == F.col("s2.y")),
        )
        .join(F.broadcast(supp), F.col("s1.sk") == F.col("s_suppkey"))
        .where(
            _wide(F.col("r2.cents")) * F.col("s1.cents")
            > _wide(F.col("r1.cents")) * F.col("s2.cents")
        )
        .select(
            F.col("s1.sk").alias("suppkey"),
            F.col("s_nationkey").alias("nationkey"),
            F.col("s1.y").alias("y1"),
            F.col("s2.y").alias("y2"),
            F.col("s1.cents").alias("sold1"),
            F.col("r1.cents").alias("ret1"),
            F.col("s2.cents").alias("sold2"),
            F.col("r2.cents").alias("ret2"),
        )
    )


# ---------------------------------------------------------------------------
# Q5 shape (r18): multi-channel UNION ALL of two differently-shaped
# fact legs (sales and returns) rolled up over (channel, nation) with
# GROUPING() levels and a derived profit.  The original unions
# sales/returns pairs from the store, catalog, and web channels into
# one (channel, id, sales, returns, profit) stream and reports
# GROUP BY ROLLUP(channel, id).
# ---------------------------------------------------------------------------


@query(
    "tpcds_q5",
    oracle="""
    WITH leg AS (
      SELECT l_orderkey AS ok, l_suppkey AS sk,
             CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                  AS BIGINT) AS sales_c,
             CAST(0 AS BIGINT) AS ret_c
      FROM lineitem WHERE l_returnflag = 'N'
      UNION ALL
      SELECT l_orderkey, l_suppkey,
             CAST(0 AS BIGINT),
             CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                  AS BIGINT)
      FROM lineitem WHERE l_returnflag = 'R'
    ),
    cell AS (
      SELECT substr(o.o_orderpriority, 1, 1) AS ch,
             s.s_nationkey AS nationkey,
             CAST(SUM(leg.sales_c) AS BIGINT) AS sales_c,
             CAST(SUM(leg.ret_c) AS BIGINT) AS ret_c
      FROM leg
      JOIN orders o ON leg.ok = o.o_orderkey
      JOIN supplier s ON leg.sk = s.s_suppkey
      GROUP BY 1, 2
    )
    SELECT ch, nationkey,
           CAST(GROUPING(ch) AS INT)
             + CAST(GROUPING(nationkey) AS INT) AS lochierarchy,
           CAST(SUM(sales_c) AS BIGINT) AS sales_cents,
           CAST(SUM(ret_c) AS BIGINT) AS ret_cents,
           CAST(SUM(sales_c) - SUM(ret_c) AS BIGINT) AS profit_cents
    FROM cell
    GROUP BY ROLLUP(ch, nationkey)
    HAVING COUNT(*) > 0
    """,
)
def q_tpcds_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q5 shape — a UNION ALL of two differently-shaped fact
    legs (the sold channel carries sales cents and a zero returns
    column, the returned channel the reverse), aggregated to
    (channel, nation) cells and reported GROUP BY ROLLUP(channel,
    nation) with GROUPING() levels and profit = sales - returns.
    Channels derive from the o_orderpriority code digit (five
    channels, all present at every SF); nation from the supplier dim.
    Profit goes NEGATIVE for ~half the cells at every SF (probed:
    20/50 cells at sf0.001, 70/125 at sf0.01, 62/125 at sf0.1) — the
    sign edge is alive at every volume.

    Scale: the union is of PROJECTED fact scans (each leg's filter
    pushes to parquet; no join before the union), so the unioned
    stream is one pass over the fact; the orders join keys the grown
    orderkey dim ONCE (shuffle join at 100 TB); supplier broadcasts;
    the rollup input is the bounded (channel, supplier) cell table
    after a map-combinable pre-aggregation, never the fact.
    HAVING COUNT(*) > 0 is the house empty-rollup guard.

    Reference parity: SURVEY.md §2.4 partial->final aggregation
    (host/aggr/aggr_native.cc:67-73) composed with §2.6 PK-FK join
    (host/join/join_dpu.cc:168-400) over a unioned two-channel plan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    rc = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    zero = F.lit(0).cast("bigint")

    def leg(flag: str, sales: bool) -> DataFrame:
        return li.where(F.col("l_returnflag") == flag).select(
            F.col("l_orderkey").alias("ok"),
            F.col("l_suppkey").alias("sk"),
            (rc if sales else zero).alias("sales_c"),
            (zero if sales else rc).alias("ret_c"),
        )

    u = leg("N", True).unionByName(leg("R", False))
    ords = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.substring("o_orderpriority", 1, 1).alias("ch"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    cell = (
        u.join(ords, F.col("ok") == F.col("o_orderkey"))
        .groupBy("ch", "sk")
        .agg(
            F.sum("sales_c").cast("bigint").alias("sales_c"),
            F.sum("ret_c").cast("bigint").alias("ret_c"),
        )
        .join(F.broadcast(supp), F.col("sk") == F.col("s_suppkey"))
        .select("ch", F.col("s_nationkey").alias("nationkey"),
                "sales_c", "ret_c")
    )
    return (
        cell.rollup("ch", "nationkey")
        .agg(
            (
                F.grouping("ch").cast("int")
                + F.grouping("nationkey").cast("int")
            ).alias("lochierarchy"),
            F.sum("sales_c").cast("bigint").alias("sales_cents"),
            F.sum("ret_c").cast("bigint").alias("ret_cents"),
            (F.sum("sales_c") - F.sum("ret_c"))
            .cast("bigint")
            .alias("profit_cents"),
            F.count(F.lit(1)).alias("_n"),
        )
        .where(F.col("_n") > 0)
        .drop("_n")
    )


# ---------------------------------------------------------------------------
# Q93 shape (r18): returns-adjusted fact — sold-order aggregates LEFT
# JOINed to a returns aggregate on the same key, the measure adjusted
# through COALESCE and clamped at zero, re-aggregated per customer,
# deterministic top-k.  The original left-joins store_sales to
# store_returns on (item, ticket), adjusts quantity*price where a
# return matched, sums per customer, and takes the ORDER BY ... LIMIT
# head.
# ---------------------------------------------------------------------------


@query(
    "tpcds_q93",
    oracle="""
    WITH sold AS (
      SELECT l_orderkey AS ok,
             CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                  * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sold_c,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sold_q
      FROM lineitem WHERE l_returnflag = 'N' GROUP BY 1
    ),
    rets AS (
      SELECT l_orderkey AS ok,
             CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                  * 100 + 0.5) AS BIGINT)) AS BIGINT) AS ret_c,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ret_q
      FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1
    ),
    adj AS (
      SELECT o.o_custkey AS custkey,
             GREATEST(sold.sold_c - COALESCE(rets.ret_c, 0), 0) AS net_c,
             GREATEST(sold.sold_q - COALESCE(rets.ret_q, 0), 0) AS net_q
      FROM sold
      LEFT JOIN rets ON sold.ok = rets.ok
      JOIN orders o ON sold.ok = o.o_orderkey
    )
    SELECT custkey,
           CAST(SUM(net_c) AS BIGINT) AS act_cents,
           CAST(SUM(net_q) AS BIGINT) AS act_qty,
           COUNT(*) AS n_orders
    FROM adj GROUP BY custkey
    ORDER BY act_cents DESC, custkey ASC
    LIMIT 100
    """,
)
def q_tpcds_q93(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q93 shape — the returns-adjusted fact: per-order sold
    ('N') aggregates LEFT JOINed to the per-order returns ('R')
    aggregate, net revenue/quantity = GREATEST(sold - COALESCE(ret,
    0), 0) (unmatched orders pass through whole; over-returned orders
    clamp to zero), re-aggregated per customer, deterministic top-100
    by (act_cents DESC, custkey ASC).

    The match grain is the ORDER (the r17 growth rule: lines per
    order are volume-invariant, so the three edges hold constant
    proportions at every SF — probed: 297/1110 sold orders unmatched,
    393 clamped, 420 partially adjusted at sf0.001; 28,961 / 41,004 /
    40,639 of 110,604 at sf0.1).  A (orderkey, partkey) grain — the
    original's (item, ticket) — was probed and REJECTED: 16/8/19
    matches across the three SFs, a dying edge.

    Scale: both legs collapse the fact ONCE to order-grain cells
    (map-combinable), the LEFT JOIN and the orders PK-FK join key the
    grown orderkey dim, the customer re-aggregation is bounded by the
    customer count, and the head is TakeOrderedAndProject (top-k
    heap per partition, never a global sort).

    Reference parity: SURVEY.md §2.4 aggregation + §2.6 join composed
    with the §2.1 sort/top-k utility (reference join_test.cc:27-38).
    """
    li = load_table(spark, sf_dir, "lineitem")
    rc = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))

    def order_grain(flag: str, cn: str, qn: str) -> DataFrame:
        return (
            li.where(F.col("l_returnflag") == flag)
            .select(
                F.col("l_orderkey").alias("ok"),
                rc.alias("c"),
                F.col("l_quantity").cast("bigint").alias("q"),
            )
            .groupBy("ok")
            .agg(
                F.sum("c").cast("bigint").alias(cn),
                F.sum("q").cast("bigint").alias(qn),
            )
        )

    sold = order_grain("N", "sold_c", "sold_q")
    rets = order_grain("R", "ret_c", "ret_q")
    ords = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    zero = F.lit(0).cast("bigint")
    adj = (
        sold.join(rets, "ok", "left")
        .join(ords, F.col("ok") == F.col("o_orderkey"))
        .select(
            F.col("o_custkey").alias("custkey"),
            F.greatest(
                F.col("sold_c") - F.coalesce(F.col("ret_c"), zero), zero
            ).alias("net_c"),
            F.greatest(
                F.col("sold_q") - F.coalesce(F.col("ret_q"), zero), zero
            ).alias("net_q"),
        )
    )
    return (
        adj.groupBy("custkey")
        .agg(
            F.sum("net_c").cast("bigint").alias("act_cents"),
            F.sum("net_q").cast("bigint").alias("act_qty"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("act_cents").desc(), F.col("custkey").asc())
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q39 shape (r18): second-moment statistics — per-(supplier, month)
# quantity mean/variance cells kept where the coefficient of variation
# clears a threshold, self-joined on CONSECUTIVE months (with the
# December -> January rollover).  The original computes stdev/mean of
# inventory per (item, warehouse, month) and pairs month m with m+1
# where both months' cov > 1.
# ---------------------------------------------------------------------------


@query(
    "tpcds_q39",
    oracle="""
    WITH cell AS (
      SELECT l_suppkey AS sk,
             CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)
               AS m,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                  * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2
      FROM lineitem GROUP BY 1, 2
    ),
    pass AS (
      SELECT * FROM cell
      WHERE n > 1
        AND 4 * CAST(n AS HUGEINT)
              * (CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1)
            > (CAST(n AS HUGEINT) - 1) * s1 * s1
    )
    SELECT a.sk AS suppkey, s.s_nationkey AS nationkey,
           a.m AS m1, b.m AS m2,
           a.n AS n1, a.s1 AS sumq1, a.s2 AS sumsq1,
           b.n AS n2, b.s1 AS sumq2, b.s2 AS sumsq2
    FROM pass a
    JOIN pass b ON a.sk = b.sk
      AND b.m = CASE WHEN a.m % 100 = 12 THEN a.m + 89 ELSE a.m + 1 END
    JOIN supplier s ON a.sk = s.s_suppkey
    """,
)
def q_tpcds_q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q39 shape — the variance filter WITHOUT materializing
    variance: per-(supplier, month) quantity cells carry the exact
    integer moments (n, sum q, sum q^2), and cov > 1/2 is the integer
    cross-multiplication 4*n*(n*s2 - s1^2) > (n-1)*s1^2 (sample
    variance > mean^2/4, i.e. stdev/mean > 1/2 — the original's cov>1
    never fires on uniform 1..50 quantities, cov ~0.57 straddles 1/2
    at every SF).  Surviving cells self-join on CONSECUTIVE months
    including the December->January rollover (m+89 in yyyymm
    arithmetic), the supplier dim broadcasts for the nation label.

    Supplier is a GROWTH dimension (the r17 lesson): lines per
    (supplier, month) stay ~7.5 at every SF, so every edge holds
    constant proportions — probed: n=1 cells excluded 11/81/752,
    cov-fail cells 265/2,747/27,522, surviving consecutive pairs
    362/3,522/35,222 (~43% of cells), of which 21/255/2,597 cross the
    year boundary, at sf0.001/0.01/0.1 respectively.

    Scale: ONE map-combinable pass collapses the fact to bounded
    (supplier, month) cells carrying three integer moments — second
    moments compose exactly under partial aggregation (the same
    partial->final law as SUM); the self-join keys the bounded cell
    table, never the fact; the widened comparison stays exact to
    10^38 (n*s2 ~ 10^4 rows * 2.5e3 ~ 10^8 per cell at fixture
    densities, ~10^16 at 100 TB cell sizes — BIGINT-safe today,
    _wide-guarded for the class).

    Reference parity: SURVEY.md §2.4 partial->final aggregation
    (host/aggr/aggr_native.cc:67-73) generalized to second moments,
    composed with the §2.6 join over derived relations."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    cell = (
        li.select(
            F.col("l_suppkey").alias("sk"),
            _yyyymm("l_shipdate").alias("m"),
            q.alias("q"),
        )
        .groupBy("sk", "m")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("q").cast("bigint").alias("s1"),
            F.sum(F.col("q") * F.col("q")).cast("bigint").alias("s2"),
        )
    )
    kept = cell.where(
        (F.col("n") > 1)
        & (
            4
            * _wide(F.col("n"))
            * (
                _wide(F.col("n")) * F.col("s2")
                - _wide(F.col("s1")) * F.col("s1")
            )
            > (_wide(F.col("n")) - 1) * _wide(F.col("s1")) * F.col("s1")
        )
    )
    a, b = kept.alias("a"), kept.alias("b")
    succ = F.when(
        F.col("a.m") % 100 == 12, F.col("a.m") + 89
    ).otherwise(F.col("a.m") + 1)
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    return (
        a.join(b, (F.col("a.sk") == F.col("b.sk")) & (F.col("b.m") == succ))
        .join(F.broadcast(supp), F.col("a.sk") == F.col("s_suppkey"))
        .select(
            F.col("a.sk").alias("suppkey"),
            F.col("s_nationkey").alias("nationkey"),
            F.col("a.m").alias("m1"),
            F.col("b.m").alias("m2"),
            F.col("a.n").alias("n1"),
            F.col("a.s1").alias("sumq1"),
            F.col("a.s2").alias("sumsq1"),
            F.col("b.n").alias("n2"),
            F.col("b.s1").alias("sumq2"),
            F.col("b.s2").alias("sumsq2"),
        )
    )


# ---------------------------------------------------------------------------
# Q49 shape (r18): dual-rank worst-performers — per-channel
# return-ratio AND currency-ratio ranks over the same aggregate, rows
# kept where EITHER rank clears top-10.  The original ranks each
# channel's items by quantity return ratio and by amount return ratio
# and unions the rank<=10 survivors across channels.
# ---------------------------------------------------------------------------


@query(
    "tpcds_q49",
    oracle="""
    WITH cell AS (
      SELECT substr(o.o_orderpriority, 1, 1) AS ch, l.l_partkey AS pk,
             SUM(CASE WHEN l.l_returnflag = 'N'
                 THEN CAST(l.l_quantity AS BIGINT) ELSE 0 END) AS qs,
             SUM(CASE WHEN l.l_returnflag = 'R'
                 THEN CAST(l.l_quantity AS BIGINT) ELSE 0 END) AS qr,
             SUM(CASE WHEN l.l_returnflag = 'N'
                 THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                      * 100 + 0.5) AS BIGINT) ELSE 0 END) AS cs,
             SUM(CASE WHEN l.l_returnflag = 'R'
                 THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                      * 100 + 0.5) AS BIGINT) ELSE 0 END) AS cr
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_returnflag IN ('N', 'R')
      GROUP BY 1, 2
      HAVING qs > 0 AND qr > 0
    ),
    ranked AS (
      SELECT ch, pk AS partkey,
             CAST(qr AS DOUBLE) / qs AS return_ratio,
             CAST(cr AS DOUBLE) / cs AS currency_ratio,
             RANK() OVER (PARTITION BY ch
               ORDER BY CAST(qr AS DOUBLE) / qs DESC, pk ASC)
               AS return_rank,
             RANK() OVER (PARTITION BY ch
               ORDER BY CAST(cr AS DOUBLE) / cs DESC, pk ASC)
               AS currency_rank
      FROM cell
    )
    SELECT ch, partkey, return_ratio, currency_ratio,
           return_rank, currency_rank
    FROM ranked
    WHERE return_rank <= 10 OR currency_rank <= 10
    """,
)
def q_tpcds_q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q49 shape — the dual-rank worst-performers: one
    (channel, part) aggregate carries both the quantity return ratio
    (qty returned / qty sold) and the currency return ratio (cents
    returned / cents sold); each ranks independently per channel
    (ratio DESC — worst first — with the partkey tiebreak making the
    order total, so RANK is deterministic in both engines), and a row
    survives when EITHER rank clears top-10.  Ratios are
    double-of-exact-int divisions (identical operands both engines,
    the q36 precedent); the rank ORDER BY uses those identical
    doubles, never engine-local rounding.

    Part is a GROWTH dimension: matched (sold AND returned) parts per
    channel grow with the fact while the kept head stays ~10-20 per
    channel per rank — probed keeps: 88/100/99 rows at
    sf0.001/0.01/0.1, with BOTH single-rank directions alive at every
    SF (kept by return-rank only 38/50/49, by currency-rank only
    38/50/49) and all five channels represented.

    Scale: the naive plan — two full windows PARTITION BY channel —
    concentrates the whole cell table into 5 tasks (one per channel)
    and sorts ~cells/5 rows in each: a single-task OOM hazard once
    parts reach 1e9.  This plan avoids it: (1) the fact joins the
    grown orders dim ONCE for the channel label and collapses
    map-combinably to (channel, part) cells; (2) each rank dimension
    finds its top-10 through a rank<=10 filter that Spark pushes as
    WindowGroupLimit — every map partition keeps only its top 10 per
    channel BEFORE the exchange, so no task ever sorts more than its
    own partition's head; (3) the <=20 kept keys per channel
    broadcast back over the cell table and ONE counting pass
    computes both EXACT global ranks as count(strictly better) + 1 —
    identical to RANK under the (ratio DESC, pk ASC) total order.
    Every exchange above the first aggregation is bounded; the cell
    subtree is shared by all three consumers (reused exchange).

    Reference parity: SURVEY.md §2.1 row 6 sort/top-k utility
    (reference join_test.cc:27-38) doubled over one §2.4 aggregate,
    composed with the §2.6 PK-FK join."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("N", "R")
    )
    ords = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.substring("o_orderpriority", 1, 1).alias("ch"),
    )
    rc = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    q = F.col("l_quantity").cast("bigint")

    def flagged(col: Column, flag: str) -> Column:
        return F.sum(
            F.when(F.col("l_returnflag") == flag, col).otherwise(
                F.lit(0).cast("bigint")
            )
        ).cast("bigint")

    cell = (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("ch", F.col("l_partkey").alias("pk"))
        .agg(
            flagged(q, "N").alias("qs"),
            flagged(q, "R").alias("qr"),
            flagged(rc, "N").alias("cs"),
            flagged(rc, "R").alias("cr"),
        )
        .where((F.col("qs") > 0) & (F.col("qr") > 0))
    )
    ratios = cell.select(
        "ch",
        "pk",
        (F.col("qr").cast("double") / F.col("qs")).alias("rr"),
        (F.col("cr").cast("double") / F.col("cs")).alias("cratio"),
    )

    def top10(col: str) -> DataFrame:
        w = Window.partitionBy("ch").orderBy(
            F.col(col).desc(), F.col("pk").asc()
        )
        return (
            ratios.withColumn("rk", F.rank().over(w))
            .where(F.col("rk") <= 10)
            .drop("rk")
        )

    kept = (
        top10("rr")
        .unionByName(top10("cratio"))
        .dropDuplicates(["ch", "pk"])
    )
    against = ratios.select(
        "ch",
        F.col("pk").alias("cpk"),
        F.col("rr").alias("crr"),
        F.col("cratio").alias("ccr"),
    )

    def beats(r: str, k: str) -> Column:
        return (F.col(r) > F.col(k)) | (
            (F.col(r) == F.col(k)) & (F.col("cpk") < F.col("pk"))
        )

    counted = (
        against.join(F.broadcast(kept), "ch")
        .groupBy("ch", "pk", "rr", "cratio")
        .agg(
            (
                F.sum(F.when(beats("crr", "rr"), 1).otherwise(0)) + 1
            ).alias("return_rank"),
            (
                F.sum(F.when(beats("ccr", "cratio"), 1).otherwise(0)) + 1
            ).alias("currency_rank"),
        )
    )
    return counted.where(
        (F.col("return_rank") <= 10) | (F.col("currency_rank") <= 10)
    ).select(
        "ch",
        F.col("pk").alias("partkey"),
        F.col("rr").alias("return_ratio"),
        F.col("cratio").alias("currency_ratio"),
        "return_rank",
        "currency_rank",
    )
