"""Full-registry plan lint: build EVERY registered query and scan its
physical plan for the two scale-killers that must never appear —
CartesianProduct (quadratic unless provably scalar x scalar) and
BatchEvalPython (row-at-a-time Python UDF in the plan; the Arrow
variants ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas are
the sanctioned Python seams).

tests/test_plans.py pins the plan SHAPE of ~45 targeted queries; this
tool is the blanket sweep across all ~190 so a future registration
can't quietly regress the fleet. Streaming queries execute during
build; their returned batch DataFrame's plan is what gets scanned
(their streaming plans are gated separately in tests/test_streaming).

Usage: python tools/plan_scan.py [sf_dir]   (default sf0.001)
Exits nonzero on any unexpected hit.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dpu_olap_spark.registry import all_queries
from dpu_olap_spark.session import ensure_thread_active, get_spark

# CartesianProduct sites that are provably bounded: scalar x scalar
# combines (1 row x 1 row), audited by hand and by the r10 judge.
_ALLOWED_CARTESIAN = {
    "funnel",          # events_analytics.py:60 1x1 scalar combine
    "session_funnel",  # same pre-aggregated scalar pattern
}

# GLOBAL (unpartitioned) windows move their whole input to ONE task.
# These five are deliberate, with bounded inputs or documented scale
# alternatives; anything NEW flagging here needs the same justification.
_ALLOWED_GLOBAL_WINDOW = {
    "take",            # global index semantics (reference take.c parity)
    "tpch_q15",        # rank over per-supplier aggregates (dim-bounded)
    "gap_fill",        # last() over per-hour aggregates (time-bounded)
    "vocab_coverage",  # row_number over the vocabulary (token-bounded)
    "window_dist",     # documented: 100 TB path is `percentiles` two-pass
    "skyline_pareto",  # phase-2 merge sweep over per-bucket survivors
                       # (bounded by buckets x distinct sizes, never
                       # fact rows; phase-1 windows are bucketed)
    "tpcds_q51",       # cumulative splice over the month axis — both
                       # channels pre-aggregate to <=84 calendar rows
                       # before the FULL OUTER + window (plan-gated in
                       # test_tpcds_q51_channels_aggregate_before_full_outer)
}


def _has_global_window(plan: str) -> bool:
    """A windowspecdefinition whose FIRST argument is an ordering or a
    frame has an empty partition-by list -> single-task window."""
    import re

    for m in re.finditer(r"windowspecdefinition\(([^,)]*)[,)]", plan):
        head = m.group(1).strip()
        if head.startswith("specifiedwindowframe") or re.search(
            r"\b(ASC|DESC)\b", head
        ):
            return True
    return False


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-scan")
    ensure_thread_active(spark)
    bad = 0
    for name, q in sorted(all_queries().items()):
        try:
            df = q.build(spark, sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 - report and continue
            bad += 1
            print(f"{name}: BUILD ERROR {type(e).__name__}: {e}")
            continue
        hits = []
        if "CartesianProduct" in plan and name not in _ALLOWED_CARTESIAN:
            hits.append("CartesianProduct")
        if "BatchEvalPython" in plan:
            hits.append("BatchEvalPython(row-at-a-time UDF)")
        if (_has_global_window(plan)
                and name not in _ALLOWED_GLOBAL_WINDOW):
            hits.append("global window (single-task)")
        if hits:
            bad += 1
            print(f"{name}: {', '.join(hits)}")
        else:
            print(f"{name}: clean")
    print(f"\nscanned {len(all_queries())} queries, {bad} offenders")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
