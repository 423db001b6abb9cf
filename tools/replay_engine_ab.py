#!/usr/bin/env python
"""A/B the chunked-replay engine knobs the r18 verdict asked for
(item 2): RocksDB state-store provider vs the default HDFS-backed
one, and disabling no-data micro-batches — while proving the emitted
multiset is unchanged (row count + value checksum; any change is an
automatic rejection regardless of speed).

Per-batch StreamingQueryProgress durations are captured via a
StreamingQueryListener so a wall-clock move is attributable to a
phase (addBatch / walCommit / triggerExecution), not guessed.

Usage: python tools/replay_engine_ab.py [sf_dir] [reps]
Variants alternate within one session (interleaved same-box A/B, the
r18 box-noise protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dpu_olap_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("replay-engine-ab")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql.streaming import StreamingQueryListener

    progress: list[dict] = []

    class Cap(StreamingQueryListener):
        def onQueryStarted(self, e):  # noqa: N802
            pass

        def onQueryProgress(self, e):  # noqa: N802
            progress.append(json.loads(e.progress.json))

        def onQueryIdle(self, e):  # noqa: N802
            pass

        def onQueryTerminated(self, e):  # noqa: N802
            pass

    spark.streams.addListener(Cap())

    from dpu_olap_spark.streaming.replay import _replay_chunked_checked

    VARIANTS = {
        "base": {},
        "rocksdb": {
            "spark.sql.streaming.stateStore.providerClass": (
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider"
            ),
        },
        "rocksdb_changelog": {
            "spark.sql.streaming.stateStore.providerClass": (
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider"
            ),
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled": "true",
        },
        "nodata_off": {
            "spark.sql.streaming.noDataMicroBatches.enabled": "false",
        },
    }

    def run(variant: str, how: str) -> tuple[float, int, int, dict]:
        confs = VARIANTS[variant]
        prev = {k: spark.conf.get(k, None) for k in confs}
        for k, v in confs.items():
            spark.conf.set(k, v)
        progress.clear()
        try:
            t0 = time.perf_counter()
            out = _replay_chunked_checked(spark, sf_dir, how=how)
            rows = out.count()
            chk = out.selectExpr(
                "sum(hash(user_id, purchase_id, click_id)) as c"
            ).first()[0]
            wall = time.perf_counter() - t0
        finally:
            for k, v in prev.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
        time.sleep(0.5)  # let listener events drain
        phases: dict[str, float] = {"batches": 0}
        for p in progress:
            phases["batches"] += 1
            for k, v in (p.get("durationMs") or {}).items():
                phases[k] = phases.get(k, 0) + v
        return wall, rows, chk, phases

    # one untimed warmup (chunk fixture build + codegen)
    run("base", "fullOuter")

    results: dict[str, list] = {v: [] for v in VARIANTS}
    checks: dict[str, set] = {v: set() for v in VARIANTS}
    for r in range(reps):
        for v in VARIANTS:
            wall, rows, chk, phases = run(v, "fullOuter")
            results[v].append(wall)
            checks[v].add((rows, chk))
            print(
                f"rep{r} {v:18s} wall={wall:6.2f}s rows={rows} "
                f"phases={json.dumps(phases)}",
                flush=True,
            )
    print("\n=== summary (fullOuter) ===")
    for v, ws in results.items():
        ws_s = sorted(ws)
        print(
            f"{v:18s} median={ws_s[len(ws_s)//2]:6.2f} best={ws_s[0]:6.2f} "
            f"all={['%.2f' % w for w in ws]} distinct_results={checks[v]}"
        )
    base_chk = checks["base"]
    for v, c in checks.items():
        if c != base_chk:
            print(f"*** RESULT MISMATCH: {v} {c} vs base {base_chk}")


if __name__ == "__main__":
    main()
