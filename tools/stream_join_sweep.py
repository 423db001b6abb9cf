"""Stream-stream join replay tuning sweep (r15 verdict #3).

SCALE_PROBE.md's r15 streaming-state section measured the REPLAY wall
of the symmetric stream-stream joins growing linearly with history
(joinstate_read 8.6 -> 71.3 s, stream_full_outer_join 7.2 -> 72.6 s at
1M -> 10M events; throughput flat at ~0.14 M rows/s) while STATE stays
bounded (the 0.04% watermark horizon).  The state design is right; the
wall is the per-row cost of the symmetric-hash-join micro-batch path.
This sweep isolates the two levers the verdict names:

  * state partitions (8 was sized for the ~150-key AGG state; the
    JOIN path pushes the whole fact through per-partition state-store
    commits, so the right number for replay tracks CORES, not keys)
  * state-store provider (HDFS-backed map vs RocksDB)
  (micro-batch count is NOT a lever here: the fixture is one file and
  availableNow drains it in a single micro-batch — the wall is the
  single-batch symmetric-join throughput, so partitions x provider is
  the whole space)

Usage: python tools/stream_join_sweep.py [n_events] [sweep_dir]
Prints one line per configuration; the adopted outcome is recorded in
SCALE.md and the operator defaults.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402

from dpu_olap_spark.session import get_spark, tune  # noqa: E402

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def build_fo_join(spark, sf_dir: str, source=None,
                  watermark: str = "1 hour",
                  how: str = "fullOuter") -> DataFrame:
    """The q_stream_full_outer_join / q_stream_left_outer_join
    pipeline — since r17 this IS the registered builder
    (windows.interval_join_pipeline), so the sweep measures the exact
    code path the operators run; ``how`` times either outer leg (r18:
    stream_replay_chunked_lo registers the leftOuter one)."""
    from dpu_olap_spark.streaming.windows import interval_join_pipeline

    return interval_join_pipeline(
        spark, sf_dir, how=how, watermark=watermark, source=source
    )


def make_chunked_fixture(spark, sf_dir: str, k: int) -> str:
    """Rewrite the single events.parquet as k EVENT-TIME-ORDERED chunk
    files with strictly increasing mtimes, so a maxFilesPerTrigger=1
    stream replays history in watermark order.  THIS is the lever the
    one-file fixture hides: in a single giant micro-batch the
    symmetric join must hold EVERY input row in state (eviction only
    runs between batches), so state-store adds degrade on the full
    10M; time-ordered chunks advance the watermark between batches
    and keep live state at the horizon sliver.  Ordering is REQUIRED
    for correctness, not just speed — unordered chunks would put most
    later-arriving rows below the advanced watermark and silently
    drop them (the late-data rule)."""
    import glob
    import shutil

    dst = os.path.join(sf_dir, f"chunks_{k}")
    # Reuse only a COMPLETE fixture: chunk_0000 alone does not prove
    # all k chunks landed (an interrupted build leaves a partial set
    # that later sweeps would silently replay, under-reporting work).
    if len(glob.glob(os.path.join(dst, "chunk_*.parquet"))) == k:
        return dst
    if os.path.exists(dst):
        shutil.rmtree(dst)
    # Build in a staging dir and rename atomically so an interrupted
    # run never leaves a partial dst behind.
    stage = dst + ".building"
    if os.path.exists(stage):
        shutil.rmtree(stage)
    os.makedirs(stage)
    tmp = os.path.join(stage, "_multi")
    (spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
     .repartitionByRange(k, "ts").sortWithinPartitions("ts")
     .write.mode("overwrite").parquet(tmp))
    now = time.time() - 10_000
    parts = sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))
    assert len(parts) == k, f"expected {k} range partitions, got {len(parts)}"
    for i, part in enumerate(parts):
        tgt = os.path.join(stage, f"chunk_{i:04d}.parquet")
        shutil.move(part, tgt)
        os.utime(tgt, (now + i, now + i))  # mtime = replay order
    shutil.rmtree(tmp)
    os.rename(stage, dst)
    return dst


def chunk_source(spark, chunk_dir: str, files_per_trigger: int):
    schema = spark.read.parquet(chunk_dir).schema

    def make():
        return (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", files_per_trigger)
            .load(chunk_dir)
        )

    return make


def run_once(spark, sf_dir: str, partitions: int, provider: str | None,
             label: str, source=None, how: str = "fullOuter") -> tuple[float, int]:
    joined = build_fo_join(spark, sf_dir, source=source, how=how)
    with tempfile.TemporaryDirectory(prefix="sweep_ckpt_") as ckpt:
        confs = {"spark.sql.shuffle.partitions": str(partitions)}
        if provider:
            confs["spark.sql.streaming.stateStore.providerClass"] = provider
        prev = {k: spark.conf.get(k, None) for k in confs}
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            t0 = time.monotonic()
            q = (
                joined.writeStream.outputMode("append")
                .format("memory")
                .queryName(f"sweep_{label}")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            finished = q.awaitTermination(900)
            wall = time.monotonic() - t0
            q.stop()
            if not finished:
                raise RuntimeError(f"{label}: did not drain in 900s")
            n = spark.table(f"sweep_{label}").count()
            spark.catalog.dropTempView(f"sweep_{label}")
            return wall, n
        finally:
            for k, v in prev.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    base = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep_ev"
    spark = get_spark("stream-join-sweep")
    tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    sf_dir = os.path.join(base, f"n{n}")
    if not os.path.exists(os.path.join(sf_dir, "events.parquet")):
        from tools.scale_probe import gen_events_file

        gen_events_file(spark, n, sf_dir)

    print(f"# stream_full_outer_join replay sweep, {n:,} events")
    results = []

    def record(label, wall, rows):
        thr = n / wall / 1e6
        results.append((label, wall, thr, rows))
        print(f"{label:>22}: {wall:7.2f}s  {thr:5.2f} M rows/s  "
              f"emitted={rows:,}", flush=True)

    # one-batch replays: partitions x provider (1M signal: rocksdb
    # loses 2-3x everywhere; p64 overshoots — keep the contenders)
    for partitions in (8, 16, 32):
        wall, rows = run_once(spark, sf_dir, partitions, None,
                              f"p{partitions}_hdfs")
        record(f"p{partitions}_hdfs_1batch", wall, rows)
    wall, rows = run_once(spark, sf_dir, 16, ROCKSDB, "p16_rocksdb")
    record("p16_rocksdb_1batch", wall, rows)

    # event-time-ordered chunked replays: watermark advances between
    # micro-batches, so join state stays at the horizon sliver instead
    # of the whole input
    for k in (10, 40):
        chunk_dir = make_chunked_fixture(spark, sf_dir, k)
        src = chunk_source(spark, chunk_dir, 1)
        wall, rows = run_once(spark, sf_dir, 16, None,
                              f"p16_chunked{k}", source=src)
        record(f"p16_hdfs_chunked{k}", wall, rows)
    # the leftOuter leg at the adopted knee (r18: registered as
    # stream_replay_chunked_lo) — purchase-side-only null extension,
    # so expect a wall at or below the fullOuter row
    chunk_dir = make_chunked_fixture(spark, sf_dir, 10)
    src = chunk_source(spark, chunk_dir, 1)
    wall, rows = run_once(spark, sf_dir, 16, None,
                          "p16_chunked10_lo", source=src, how="leftOuter")
    record("p16_hdfs_chunked10_LO", wall, rows)
    best = min(results, key=lambda r: r[1])
    print(f"BEST: {best[0]} at {best[1]:.2f}s ({best[2]:.2f} M rows/s)")


if __name__ == "__main__":
    main()
