#!/usr/bin/env python
"""Per-phase timing breakdown for any registered query — the analog of
the reference's per-phase timers (copy-to / work / copy-from,
/root/reference/host/timer/timer.h:13-39, async wrappers
host/join/join_dpu.cc:27-49). Spark's executed plan carries SQL
metrics per physical node; this walks the final (AQE) plan and both
prints the annotated tree and rolls the node metrics up into the
reference's phase vocabulary:

  scan      <- parquet scanTime + metadataTime     (≈ copy-to-device)
  compute   <- WholeStageCodegen pipelineTime,
               HashAggregate aggTime, sort sortTime (≈ kernel work)
  exchange  <- shuffle write time + fetch wait,
               broadcast collect/build/broadcast    (≈ copy-from/scatter)

Usage: python tools/phase_metrics.py [query_name] [sf_dir]
(defaults: join_agg /root/testdata/sf0.01). Times are milliseconds of
TASK time, summed across parallel tasks — a utilization figure, not
wall clock (the reference's timers are per-rank and then aggregated
the same way).
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dpu_olap_spark.registry import all_queries
from dpu_olap_spark.session import get_spark

_PHASE_OF = {
    "scanTime": "scan",
    "metadataTime": "scan",
    "pipelineTime": "compute",
    "aggTime": "compute",
    "sortTime": "compute",
    "buildTime": "exchange",
    "collectTime": "exchange",
    "broadcastTime": "exchange",
    "shuffleWriteTime": "exchange",
    "fetchWaitTime": "exchange",
}


def _iter_metrics(node):
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        yield kv._1(), kv._2().value()


def walk(node, phases, depth=0, lines=None):
    name = node.nodeName()
    parts = []
    for key, value in _iter_metrics(node):
        if value in (0, -1):
            continue
        parts.append(f"{key}={value}")
        phase = _PHASE_OF.get(key)
        if phase:
            # shuffle write time is tracked in nanoseconds; the rest ms
            phases[phase] += value / 1e6 if key == "shuffleWriteTime" else value
    lines.append("  " * depth + name + (" | " + ", ".join(parts[:6]) if parts else ""))
    if name == "AdaptiveSparkPlan":
        walk(node.executedPlan(), phases, depth + 1, lines)
        return
    if "QueryStage" in name:
        walk(node.plan(), phases, depth + 1, lines)
        return
    children = node.children()
    for i in range(children.size()):
        walk(children.apply(i), phases, depth + 1, lines)


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "join_agg"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark("phase-metrics")
    spark.sparkContext.setLogLevel("ERROR")
    df = all_queries()[name].build(spark, sf_dir)
    df.collect()  # execute THIS DataFrame's QueryExecution (a .write
    # would plan and execute a separate one with untouched metrics)
    phases: dict[str, float] = defaultdict(float)
    lines: list[str] = []
    walk(df._jdf.queryExecution().executedPlan(), phases, 0, lines)
    print("\n".join(lines))
    total = sum(phases.values()) or 1.0
    print(f"\nPHASE SUMMARY for {name!r} at {sf_dir} (task-time ms):")
    for phase in ("scan", "compute", "exchange"):
        ms = phases.get(phase, 0.0)
        print(f"  {phase:9s} {ms:10.1f}  ({100 * ms / total:5.1f}%)")


if __name__ == "__main__":
    main()
