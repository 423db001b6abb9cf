"""Quantitative gates for the sketch-based queries.

Sketches (HyperLogLog++, KLL-style percentile digests) are
engine-specific, so they rightly have no exact DuckDB oracle and the
driver records a rows-only check. That leaves their VALUES ungated —
these tests close the gap with tolerance oracles: run DuckDB's exact
computation over the same parquet and assert the relative error is
inside the sketch's published bound (with slack for the tail of the
error distribution).
"""

from __future__ import annotations

from dpu_olap_spark.registry import all_queries
from tests.oracle import run_oracle

SF = "/root/testdata/sf0.01"


def test_approx_distinct_within_hll_bound(spark):
    """approx_count_distinct(rsd=0.02): HLL++ standard error is 2%;
    assert within 5 sigma (10%) of DuckDB's exact COUNT(DISTINCT)."""
    row = all_queries()["approx_distinct"].build(spark, SF).first()
    (orow,), _ = run_oracle(
        """
        SELECT COUNT(DISTINCT l_partkey) AS exact_parts,
               COUNT(DISTINCT l_orderkey) AS exact_orders
        FROM lineitem
        """,
        SF,
    )
    exact_parts, exact_orders = orow
    assert abs(row.approx_parts - exact_parts) / exact_parts < 0.10, (
        f"HLL parts estimate {row.approx_parts} vs exact {exact_parts}"
    )
    assert abs(row.approx_orders - exact_orders) / exact_orders < 0.10, (
        f"HLL orders estimate {row.approx_orders} vs exact {exact_orders}"
    )


def test_approx_percentile_within_rank_tolerance(spark):
    """approx_percentile(accuracy=10000) guarantees a RANK error of at
    most n/10000. Assert each estimate lies between the exact values at
    percentile +/- 2/10000 (rank tolerance doubled for slack), computed
    by DuckDB's exact quantile_disc."""
    rows = {
        r.l_returnflag: r
        for r in all_queries()["approx_percentile"].build(spark, SF).collect()
    }
    orows, _ = run_oracle(
        """
        SELECT l_returnflag,
               quantile_disc(l_extendedprice, 0.4998) AS p50_lo,
               quantile_disc(l_extendedprice, 0.5002) AS p50_hi,
               quantile_disc(l_extendedprice, 0.9898) AS p99_lo,
               quantile_disc(l_extendedprice, 0.9902) AS p99_hi
        FROM lineitem GROUP BY l_returnflag
        """,
        SF,
    )
    assert set(rows) == {o[0] for o in orows}
    for flag, p50_lo, p50_hi, p99_lo, p99_hi in orows:
        r = rows[flag]
        assert p50_lo <= r.p50_est <= p50_hi, (
            f"{flag}: p50 estimate {r.p50_est} outside rank band [{p50_lo}, {p50_hi}]"
        )
        assert p99_lo <= r.p99_est <= p99_hi, (
            f"{flag}: p99 estimate {r.p99_est} outside rank band [{p99_lo}, {p99_hi}]"
        )


def test_hll_mergeable_within_bound_and_consistent(spark):
    """Per-group and union-merged HLL estimates within 10% of exact;
    the merged estimate must also be consistent with a direct global
    sketch (merge loses nothing)."""
    import pyspark.sql.functions as F

    from dpu_olap_spark.sources.tables import load_table

    rows = {r.o_orderpriority: r for r in all_queries()["hll_mergeable"].build(spark, SF).collect()}
    orows, _ = run_oracle(
        """
        SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS exact
        FROM orders GROUP BY o_orderpriority
        UNION ALL
        SELECT 'ALL', COUNT(DISTINCT o_custkey) FROM orders
        """,
        SF,
    )
    for prio, exact in orows:
        est = rows[prio].approx_customers
        assert abs(est - exact) / exact < 0.10, f"{prio}: {est} vs {exact}"
    direct = (
        load_table(spark, SF, "orders")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")))
        .first()[0]
    )
    # union gadget (HLL_8) vs direct sketch (HLL_4) estimates differ
    # slightly by design; consistency bound, not equality
    assert abs(rows["ALL"].approx_customers - direct) / direct < 0.02, (
        f"union-merge {rows['ALL'].approx_customers} vs direct {direct}"
    )


def test_approx_topk_exact_regime_holds(spark):
    """approx_topk_tokens carries an EXACT oracle only because the
    corpus vocabulary is far below maxItemsTracked (10,000), where the
    space-saving sketch degenerates to exact counting. Assert that
    assumption (r5 ADVICE) with headroom, and that the 100-item margin
    covers every candidate for the top-20 cut."""
    import pyspark.sql.functions as F

    from dpu_olap_spark.llm.text_analysis import tokens
    from dpu_olap_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
    vocab = toks.agg(F.approx_count_distinct("token")).first()[0]
    assert vocab < 10_000 / 2, (
        f"vocabulary {vocab} too close to maxItemsTracked=10000 — the "
        "exact-regime assumption behind the exact oracle no longer holds"
    )
    # margin check: rank-20 boundary count must have < 100 items at or
    # above it, else the sketch's 100-item fetch could miss a candidate
    counts = (
        toks.groupBy("token").count().orderBy(F.desc("count")).limit(100).collect()
    )
    boundary = counts[19]["count"]
    n_at_or_above = sum(1 for r in counts if r["count"] >= boundary)
    assert n_at_or_above < 100, "tie plateau wider than the sketch margin"
