"""Streaming semantics beyond the oracle-checked complete-mode query:
append-mode watermark eviction and batch/stream equivalence, plus a
stateful custom operator test (applyInPandasWithState analog domain).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from dpu_olap_spark.sources.tables import load_table
from dpu_olap_spark.streaming.windows import tumbling_agg

SF = "/root/testdata/sf0.001"


def _stream_events(spark, sf_dir):
    from dpu_olap_spark.sources.tables import load_events_stream

    return load_events_stream(spark, sf_dir)


def test_stream_complete_equals_batch(spark):
    """Complete-mode stream over a finite source == batch aggregation —
    Structured Streaming's unified-API contract."""
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in tumbling_agg(load_table(spark, SF, "events")).collect()
    }
    stream = _stream_events(spark, SF)
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            tumbling_agg(stream)
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("t_complete_eq")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
    streamed = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table("t_complete_eq").collect()
    }
    assert streamed == batch


def test_append_mode_emits_only_closed_windows(spark):
    """Append mode + watermark: emitted windows are closed (window_end <=
    final watermark); late state is bounded. With availableNow over one
    file the final window(s) may be withheld — that is the semantics,
    not a bug."""
    stream = _stream_events(spark, SF)
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            tumbling_agg(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("t_append_wm")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
    appended = spark.table("t_append_wm").collect()
    complete = tumbling_agg(load_table(spark, SF, "events")).collect()
    # append output must be a subset of the batch result
    batch_map = {(r.window_start, r.event_type): (r.n_events, r.sum_value) for r in complete}
    for r in appended:
        assert batch_map[(r.window_start, r.event_type)] == (r.n_events, r.sum_value)
    assert len(appended) <= len(complete)


def test_session_window_streaming_api(spark):
    """F.session_window works on the events stream (complete mode)."""
    stream = _stream_events(spark, SF)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("t_sess_win")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
    rows = spark.table("t_sess_win").collect()
    assert rows, "session windows produced no rows"
    # session windows for a user never overlap
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.w.start, r.w.end))
    for user, spans in by_user.items():
        spans.sort()
        for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
            assert e1 <= s2, f"overlapping sessions for user {user}"


def test_stream_stream_join(spark):
    """Windowed stream-stream inner join: purchases joined to the same
    user's clicks within [-30min, 0] — both sides watermarked, so state
    is bounded. Result must equal the equivalent batch join."""
    ev = load_table(spark, SF, "events")

    def split(df, kind):
        out = df.where(F.col("event_type") == kind)
        return out.select(
            F.col("user_id").alias(f"{kind}_user"),
            F.col("ts").alias(f"{kind}_ts"),
            F.col("event_id").alias(f"{kind}_id"),
        )

    batch = (
        split(ev, "purchase")
        .join(
            split(ev, "click"),
            F.expr(
                "purchase_user = click_user AND "
                "click_ts BETWEEN purchase_ts - INTERVAL 30 MINUTES AND purchase_ts"
            ),
        )
        .count()
    )

    s = _stream_events(spark, SF)
    p = split(s, "purchase").withWatermark("purchase_ts", "1 hour")
    c = split(s, "click").withWatermark("click_ts", "1 hour")
    joined = p.join(
        c,
        F.expr(
            "purchase_user = click_user AND "
            "click_ts BETWEEN purchase_ts - INTERVAL 30 MINUTES AND purchase_ts"
        ),
    )
    import tempfile

    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName("t_ss_join")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()
    streamed = spark.table("t_ss_join").count()
    assert streamed == batch


def test_stateful_state_survives_multiple_microbatches(spark, tmp_path):
    """Split events into 3 files and feed them one per micro-batch
    (maxFilesPerTrigger=1): the keyed state must accumulate ACROSS
    batches to the same totals as the single-batch run — the actual
    contract of applyInPandasWithState."""
    from dpu_olap_spark.streaming.stateful import user_running_stats

    ev = load_table(spark, SF, "events")
    src = str(tmp_path / "events_split")
    # three roughly equal slices, written as separate files
    ev.withColumn("slice", (F.col("event_id") % 3)).repartition(1).write.partitionBy(
        "slice"
    ).parquet(src)

    batch_totals = {
        (r.user_id): (r.n, round(r.s, 2))
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")) / 100.0
            ).alias("s"),
        )
        .collect()
    }

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = user_running_stats(stream.select("user_id", "value"))
    import tempfile

    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("t_multi_batch_state")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "stream did not finish"
        n_batches = len(q.recentProgress)
        q.stop()
    t = spark.table("t_multi_batch_state")
    final = (
        t.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "sum_value")).alias("s"))
        .select("user_id", F.col("s.n_events").alias("n"), F.col("s.sum_value").alias("v"))
        .collect()
    )
    got = {r.user_id: (r.n, round(r.v, 2)) for r in final}
    assert got == batch_totals
    assert n_batches >= 3, f"expected >=3 micro-batches, saw {n_batches}"
