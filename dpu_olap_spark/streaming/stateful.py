"""Custom stateful streaming operator via applyInPandasWithState:
per-user running session stats (event count, value sum, last seen)
maintained as explicit keyed state across micro-batches.

This is the seam the reference's aggregator-function-pointer hints at
but never fills (aggregator_fn_t with opaque state,
/root/reference/dpu/shared/kernels/aggr.h:9) — generalized to keyed,
fault-tolerant, watermark-aware state.

Scale notes: state is keyed by user_id and partitioned with the
stream, so it shards across executors. Idle keys are evicted by
WATERMARK-BASED timeout (EventTimeTimeout): each key's deadline is its
last-seen event time plus an idle gap; when the stream's watermark
passes the deadline the segment's totals are flushed downstream and
the state entry is removed, so state size tracks the *active* key set,
not the all-time key set. (ProcessingTimeTimeout was rejected: Spark's
FlatMapGroupsWithStateExec.shouldRunAnotherBatch is unconditionally
true for processing-time timers, so a Trigger.AvailableNow run never
terminates — measured 45+ empty micro-batches on a 3-file source.)

Because eviction may be followed by the same key reappearing (a fresh
segment starting from zero), every emitted row carries a segment id
and exact integer-cents totals; finalize_user_stats sums the
per-segment maxima, which is correct under any eviction/reappearance
interleaving. Arrow batches keep the Python hop amortized.
"""

from __future__ import annotations

import itertools
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from dpu_olap_spark.registry import query
from dpu_olap_spark.sources.tables import load_events_stream, run_to_memory_sink

_sink_counter = itertools.count()

# A key idle for this much EVENT time (watermark domain) is evicted.
# 30 min matches the session gap used by session_window.
DEFAULT_IDLE_GAP_MS = 30 * 60 * 1000

# Watermark delay for the event-time timers; totals are unaffected
# (update mode processes late rows as a fresh segment).
WATERMARK_DELAY_MS = 10 * 1000
WATERMARK_DELAY = "10 seconds"

# Rows are per-(user, segment) cumulative snapshots; `seg` is the
# EVENT-time ms of the segment's first event, which is collision-proof
# across eviction/recreation whenever idle_gap > watermark delay:
# eviction requires watermark > last_ts + gap, and any post-eviction
# event the watermark admits has ts >= last_ts + gap - delay > last_ts,
# so each new segment's first event strictly exceeds every prior
# segment's. (Processing-time ms was rejected: two micro-batches CAN
# share a millisecond, silently merging two segments under the
# per-segment max.) `cents` keeps the sum exact for cross-segment adds.
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("seg", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("cents", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType(), False),
        T.StructField("sum_value_cents", T.LongType(), False),
        T.StructField("seg_start", T.LongType(), False),
        T.StructField("last_ts_ms", T.LongType(), False),
    ]
)


def _make_track_user(idle_gap_ms: int):
    """Build the state function as a closure so the gap rides along in
    the pickled closure cell (a module-level attribute would be
    re-imported at its default on the worker side)."""

    def _track_user(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # Accumulate per-user totals across micro-batches in integer
        # cents so the result is exact regardless of batch boundaries
        # or arrival order. On idle timeout (watermark passed last-seen
        # + gap): flush the segment's totals one final time and evict.
        (user_id,) = key

        if state.hasTimedOut:
            n, cents, seg, _last = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "seg": [seg], "n_events": [n], "cents": [cents]}
            )
            return

        if state.exists:
            n, cents, seg, last_ts_ms = state.get
        else:
            # seg assigned from the first event time below; -1 marks
            # "not yet assigned" (event times are epoch-ms positive)
            n, cents, seg, last_ts_ms = 0, 0, -1, 0
        import numpy as np

        for pdf in pdfs:
            n += len(pdf)
            # floor(x*100 + 0.5): half-up like the oracle's floor(...+0.5);
            # pandas .round() is half-to-even and would diverge on exact
            # half-cent values
            cents += int(np.floor(pdf["value"].astype(float).mul(100).add(0.5)).sum())
            batch_max = pdf["ts"].max()
            if pd.notna(batch_max):
                last_ts_ms = max(last_ts_ms, int(batch_max.value // 1_000_000))
            if seg < 0:
                batch_min = pdf["ts"].min()
                if pd.notna(batch_min):
                    # first event time = the collision-proof segment id
                    # (see OUTPUT_SCHEMA comment for the proof)
                    seg = int(batch_min.value // 1_000_000)
        if seg < 0:
            # no usable event time in the creating batch (all-null ts):
            # fall back to processing time rather than fail the stream
            seg = state.getCurrentProcessingTimeMs()
        state.update((n, cents, seg, last_ts_ms))
        # Deadline must stay ahead of the current watermark or Spark
        # rejects it; a late-arriving segment just gets the minimum
        # extension past the watermark.
        deadline = max(last_ts_ms + idle_gap_ms, state.getCurrentWatermarkMs() + 1)
        state.setTimeoutTimestamp(deadline)
        yield pd.DataFrame(
            {"user_id": [user_id], "seg": [seg], "n_events": [n], "cents": [cents]}
        )

    return _track_user


def user_running_stats(
    events_stream: DataFrame, idle_gap_ms: int = DEFAULT_IDLE_GAP_MS
) -> DataFrame:
    """events_stream needs (user_id, value, ts); ts drives the
    watermark that expires idle keys."""
    if idle_gap_ms <= WATERMARK_DELAY_MS:
        # the first-event-time segment id is only collision-proof when
        # the gap exceeds the watermark delay (see OUTPUT_SCHEMA)
        raise ValueError(
            f"idle_gap_ms ({idle_gap_ms}) must exceed the watermark "
            f"delay ({WATERMARK_DELAY_MS} ms) for unique segment ids"
        )
    return (
        events_stream.select("user_id", "value", "ts")
        .withWatermark("ts", WATERMARK_DELAY)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_track_user(idle_gap_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def finalize_user_stats(emitted: DataFrame) -> DataFrame:
    """Collapse the update-mode row stream to final per-user totals.

    Each (user, seg) group's rows are cumulative snapshots, so its
    total is the max; a user's grand total is the sum over segments.
    Correct whether or not any key was evicted and recreated."""
    per_seg = emitted.groupBy("user_id", "seg").agg(
        F.max(F.struct("n_events", "cents")).alias("s")
    )
    return per_seg.groupBy("user_id").agg(
        F.sum("s.n_events").alias("n_events"),
        (F.sum("s.cents").cast("double") / F.lit(100.0)).alias("sum_value"),
    )


@query(
    "stateful_user_stats",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
                AS DOUBLE) AS sum_value
    FROM events GROUP BY user_id
    """,
)
def q_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful operator as a real stream (availableNow, update
    mode, memory sink) and return the final per-user rows. With a
    finite source the summed per-segment totals equal the batch
    GROUP BY — the oracle. Exact integer-cents accumulation makes the
    equality bit-for-bit even if an idle key is evicted mid-run."""
    stream = load_events_stream(spark, sf_dir)
    out = user_running_stats(stream)
    sink = f"stateful_user_stats_{next(_sink_counter)}"
    # state partitions sized to the ~150-user active key set (see
    # run_to_memory_sink docstring; 4x fewer state-store commits/batch)
    run_to_memory_sink(out, sink, "update", state_partitions=8)
    return finalize_user_stats(spark.table(sink))
