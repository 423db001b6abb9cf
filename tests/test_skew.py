"""Salted join: correctness under pathological key skew + work spread."""

from __future__ import annotations

from pyspark.sql import functions as F

from dpu_olap_spark.plans.skew import salted_join


def _skewed_frames(spark):
    # 50k rows, 90% on a single hot key — the case that sinks one task
    probe = spark.range(50_000).select(
        F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    build = spark.range(100).select(F.col("id").alias("bk"), (F.col("id") * 10).alias("payload"))
    return probe, build


def test_salted_join_matches_plain_join(spark):
    probe, build = _skewed_frames(spark)
    plain = probe.join(build, probe.k == build.bk).agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"), F.sum("payload").alias("sp")
    ).first()
    salted = salted_join(probe, build, "k", "bk").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"), F.sum("payload").alias("sp")
    ).first()
    assert (plain.n, plain.sv, plain.sp) == (salted.n, salted.sv, salted.sp)


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows must land in >1 (key, salt) group."""
    probe, build = _skewed_frames(spark)
    p = probe.withColumn("_salt_p", (F.rand(42) * 8).cast("int"))
    groups = (
        p.where(F.col("k") == 7)
        .groupBy("_salt_p")
        .count()
        .collect()
    )
    assert len(groups) > 1, "salting left the hot key in one group"
    sizes = [g["count"] for g in groups]
    assert max(sizes) < sum(sizes), "no spread achieved"


def test_salted_left_join_preserves_unmatched(spark):
    probe, build = _skewed_frames(spark)
    # keys >= 100 never match; left join must keep them with null payload
    probe2 = probe.withColumn("k", F.col("k") + 60)  # some keys exceed build range
    plain = probe2.join(build, probe2.k == build.bk, "left").count()
    salted = salted_join(probe2, build, "k", "bk", how="left").count()
    assert plain == salted == probe2.count()

def test_salted_join_rejects_build_preserving_joins(spark):
    """right/full-outer would duplicate unmatched build rows once per
    salt; the helper must refuse rather than return wrong results."""
    probe, build = _skewed_frames(spark)
    import pytest

    for how in ("right", "full_outer", "full"):
        with pytest.raises(ValueError, match="probe-preserving"):
            salted_join(probe, build, "k", "bk", how=how)
