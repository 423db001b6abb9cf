#!/usr/bin/env python
"""A/B: one SHARED streaming source for both interval-join sides vs
the current two-source shape (each side builds its own readStream
over the same chunk dir / events file).

Motivation (r19, guide §1.2/§2.4): per micro-batch the engine pays
source discovery (latestOffset), getBatch, and a scan stage PER
SOURCE; the two sides consume identical batches, so one source can
feed both branches (a stream self-join — supported since Spark 3).
Emitted multiset must be identical (count + checksum) or the change
is rejected.

Usage: python tools/replay_shared_source_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dpu_olap_spark.session import get_spark  # noqa: E402
from dpu_olap_spark.sources.tables import (  # noqa: E402
    parquet_row_count,
    run_to_memory_sink,
)
from dpu_olap_spark.streaming.replay import (  # noqa: E402
    _stable_scratch,
    chunked_events_source,
    chunked_replay_partitions,
    ordered_event_chunks,
)
from dpu_olap_spark.sources.tables import replay_state_partitions  # noqa: E402

_counter = [0]


def build_joined(spark, source, how, shared: bool):
    def two_sided():
        def side(kind, id_alias, ts_alias):
            s = source()
            return s.where(F.col("event_type") == kind).select(
                F.col("user_id").alias(f"{kind}_user"),
                F.col("event_id").alias(id_alias),
                F.col("ts").alias(ts_alias),
            )
        return side("purchase", "purchase_id", "pts"), side(
            "click", "click_id", "cts"
        )

    def one_sided():
        s = source()

        def side(kind, id_alias, ts_alias):
            return s.where(F.col("event_type") == kind).select(
                F.col("user_id").alias(f"{kind}_user"),
                F.col("event_id").alias(id_alias),
                F.col("ts").alias(ts_alias),
            )
        return side("purchase", "purchase_id", "pts"), side(
            "click", "click_id", "cts"
        )

    p, c = (one_sided() if shared else two_sided())
    p = p.withWatermark("pts", "1 hour")
    c = c.withWatermark("cts", "1 hour")
    joined = p.join(
        c,
        F.expr(
            "purchase_user = click_user AND "
            "cts BETWEEN pts - INTERVAL 30 MINUTES AND pts"
        ),
        how,
    )
    user = (
        F.coalesce("purchase_user", "click_user")
        if how == "fullOuter"
        else F.col("purchase_user")
    )
    return joined.select(user.alias("user_id"), "purchase_id", "click_id")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("replay-shared-src-ab")
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

    events_path = os.path.join(sf_dir, "events.parquet")
    n = parquet_row_count(events_path)
    rows_per_chunk = max(200, n // 4)
    n_chunks = max(1, -(-n // rows_per_chunk))
    cores = spark.sparkContext.defaultParallelism
    scratch = _stable_scratch(events_path, n)
    chunk_dir = ordered_event_chunks(spark, events_path, scratch, n_chunks)
    partitions = min(
        chunked_replay_partitions(cores), replay_state_partitions(n, cores)
    )

    def run(shared: bool, how: str = "fullOuter"):
        source = chunked_events_source(spark, chunk_dir)
        progress.clear()
        t0 = time.perf_counter()
        joined = build_joined(spark, source, how, shared)
        _counter[0] += 1
        sink = f"shsrc_ab_{_counter[0]}"
        run_to_memory_sink(
            joined, sink, "append", timeout_s=900,
            state_partitions=partitions,
        )
        out = spark.table(sink)
        rows = out.count()
        chk = out.selectExpr(
            "sum(hash(user_id, purchase_id, click_id)) as c"
        ).first()[0]
        wall = time.perf_counter() - t0
        time.sleep(0.5)
        phases: dict[str, float] = {"batches": 0}
        for p in progress:
            phases["batches"] += 1
            for k, v in (p.get("durationMs") or {}).items():
                phases[k] = phases.get(k, 0) + v
        return wall, rows, chk, phases

    run(False)  # warmup

    results = {"two_source": [], "shared_source": []}
    checks = {"two_source": set(), "shared_source": set()}
    for r in range(reps):
        for label, shared in (("two_source", False), ("shared_source", True)):
            wall, rows, chk, phases = run(shared)
            results[label].append(wall)
            checks[label].add((rows, chk))
            print(
                f"rep{r} {label:14s} wall={wall:6.2f}s rows={rows} "
                f"phases={json.dumps(phases)}",
                flush=True,
            )
    print("\n=== summary (fullOuter) ===")
    for v, ws in results.items():
        s = sorted(ws)
        print(
            f"{v:14s} median={s[len(s)//2]:6.2f} best={s[0]:6.2f} "
            f"all={['%.2f' % w for w in ws]} distinct={checks[v]}"
        )
    if checks["shared_source"] != checks["two_source"]:
        print("*** RESULT MISMATCH — shared source REJECTED")


if __name__ == "__main__":
    main()
