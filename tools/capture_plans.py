#!/usr/bin/env python
"""Capture .explain("formatted") for headline queries into
plans/<round>/<query>_<tag>.txt (round dir from $SPARK_GRAFT_PLANS_TAG_DIR, default r19) — the optimization round's before/after
plan evidence (guide §1: measure first; §7.2: read the plan).

Usage: python tools/capture_plans.py <tag> [query ...]
(default: every bench.py HEADLINE query; tag is e.g. "before"/"after")

Streaming registrations execute a real availableNow stream inside
build(); their pre-execution batch plan is not reachable without
running the stream, so for stream_* / statestore_* / joinstate_read /
sink_* / pysink_write / merge_upsert / cache_scan the capture SKIPS
(their evidence is the executed-plan audit in SCALE_PROBE.md and the
phase metrics in OPTIMIZATION_r18.md).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dpu_olap_spark.registry import all_queries
from dpu_olap_spark.session import get_spark

# build() runs side effects (streams, sinks) for these families; the
# formatted plan of the RETURNED df is a plain batch read of the
# result, which carries no optimization signal.
_SKIP_PREFIXES = (
    "stream_",
    "statestore_",
    "joinstate_read",
    "sink_",
    "pysink_write",
    "merge_upsert",
    "cache_scan",
    "stateful_",
    "rocksdb_",
    "pystream_scan",
    "stream",
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_TAG_DIR", "r19"),
    )
    os.makedirs(out_dir, exist_ok=True)

    from bench import HEADLINE

    names = sys.argv[2:] or list(HEADLINE)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    for name in names:
        if any(name.startswith(p) for p in _SKIP_PREFIXES):
            print(f"skip {name} (side-effecting build)")
            continue
        df = queries[name].build(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
