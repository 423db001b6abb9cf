"""Golden micro-fixtures per reference operator — the literal small
cases from the reference test suite, re-expressed on DataFrames:

- sum([0,2,3,8,9]) == 22            (host/aggr/aggr_test.cc:24-35)
- take([0,2,3,8,9], [0,1,4]) == [0,2,9]  (host/take/take_test.cc:24-49)
- filter keeps exactly the rows below the threshold
  (host/filter/filter_test.cc:33-61)
- join of handmade 5-row batches     (host/join/join_test.cc:40-80)
- partition conserves rows and column sums, buckets are balanced
  (host/partition/partition_test.cc:21-92)
"""

from __future__ import annotations

from pyspark.sql import Row, Window
from pyspark.sql import functions as F


def test_golden_sum(spark):
    df = spark.createDataFrame([(v,) for v in [0, 2, 3, 8, 9]], ["v"])
    assert df.agg(F.sum("v")).first()[0] == 22


def test_golden_filter(spark):
    # mirror filter_test.cc: fixed threshold keeps a known subset
    df = spark.createDataFrame([(i, v) for i, v in enumerate([5, 1, 9, 0, 7])], ["i", "v"])
    out = df.where(F.col("v") < 5).orderBy("i").collect()
    assert [(r.i, r.v) for r in out] == [(1, 1), (3, 0)]


def test_golden_take(spark):
    # out[i] = buffer[indices[i]] with buffer=[0,2,3,8,9], indices=[0,1,4]
    buf = spark.createDataFrame([(i, v) for i, v in enumerate([0, 2, 3, 8, 9])], ["rn", "v"])
    idx = spark.createDataFrame([(p, i) for p, i in enumerate([0, 1, 4])], ["pos", "rn"])
    out = idx.join(buf, "rn").orderBy("pos").select("v").collect()
    assert [r.v for r in out] == [0, 2, 9]


def test_golden_join(spark):
    # handmade PK-FK batches like join_test.cc:40-80; canonicalize by sort
    left = spark.createDataFrame(
        [Row(fk=1, v_l=10), Row(fk=2, v_l=20), Row(fk=1, v_l=30)]
    )
    right = spark.createDataFrame([Row(pk=1, v_r=100), Row(pk=2, v_r=200)])
    out = left.join(right, left.fk == right.pk, "inner").orderBy("v_l").collect()
    assert [(r.fk, r.v_l, r.v_r) for r in out] == [(1, 10, 100), (2, 20, 200), (1, 30, 100)]
    # FK-side cardinality preserved (1:1 probe semantics, hash_probe.c:33)
    assert len(out) == left.count()


def test_partition_invariants(spark):
    """Row conservation, column-sum conservation (partition_test.cc:50-57)
    and bucket balance within tolerance (partition_test.cc:80-91)."""
    n = 10_000
    df = spark.range(n).select(F.col("id").alias("k"), (F.col("id") * 3 % 101).alias("v"))
    before = df.agg(F.count("*").alias("c"), F.sum("v").alias("s")).first()

    parts = df.repartition(8, F.col("k"))
    after = parts.agg(F.count("*").alias("c"), F.sum("v").alias("s")).first()
    assert (before.c, before.s) == (after.c, after.s)

    sizes = [
        r.cnt
        for r in parts.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    ]
    assert sum(sizes) == n
    ideal = n / len(sizes)
    for s in sizes:
        assert abs(s - ideal) / ideal < 0.25, f"bucket sizes unbalanced: {sizes}"


def test_take_index_derivation_is_order_stable(spark):
    """SURVEY.md section 7 pitfall: row indices must come from an explicit
    sort key, not partition order. Same result under different input
    partitioning."""
    data = [(i * 7 % 100, f"s{i}") for i in range(100)]

    def gather(num_parts: int):
        df = spark.createDataFrame(data, ["key", "payload"]).repartition(num_parts)
        numbered = df.select(
            "key", "payload", (F.row_number().over(Window.orderBy("key")) - 1).alias("rn")
        )
        return [
            (r.rn, r.key, r.payload)
            for r in numbered.where(F.col("rn").isin([0, 5, 42])).orderBy("rn").collect()
        ]

    assert gather(1) == gather(13)
