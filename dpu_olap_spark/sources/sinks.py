"""Writers/readers beyond plain parquet scan: partitioned and bucketed
parquet sinks, CSV/JSON round-trip.

The reference has no storage layer at all (SURVEY.md section 2.9);
these are the connectors a real deployment needs. Scale rationale:

- `write_partitioned`: hive-style directory partitioning gives the
  reader partition PRUNING — a filter on the partition column skips
  whole directories. Choose low-cardinality columns (date, region).
- `write_bucketed`: pre-hashes rows into N buckets on the join key and
  records it in the catalog; repeated joins/aggregations on that key
  skip the shuffle entirely — the persistent analog of the
  reference's radix partitioning step (its co-partitioned join,
  /root/reference/host/join/join_dpu.cc:200-233, rebuilt every run;
  a bucketed table does it once at write time).
- CSV/JSON: interchange formats; schema-explicit reads (never
  inferSchema in production — one pass saved and no drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 16, sort_col: str | None = None
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.
    Joins between two tables bucketed the same way on the same key run
    shuffle-free (verified in tests/test_sinks.py)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table, format="parquet")


# NULLs are written as this sentinel so empty strings (written as "")
# stay distinguishable — the default writes BOTH as an empty field and
# the round-trip silently turns '' into NULL (caught by the r11 CSV
# quoting differential). \N is the conventional text-format NULL
# marker; a data value equal to the literal two-char string '\N' would
# collide — write_csv refuses such a frame (r11 ADVICE: fail loudly
# at write time instead of corrupting a future non-TPC-H corpus).
_CSV_NULL = "\\N"


def write_csv(df: DataFrame, path: str, validate_sentinel: bool = True) -> None:
    """CSV sink with a lossless ''-vs-NULL round-trip contract.

    ``validate_sentinel`` guards the one documented hole: a real data
    value equal to the literal two-char string ``\\N`` would read back
    as NULL.  The probe short-circuits (LIMIT 1 under the filter).
    When the plan is DETERMINISTIC (Catalyst's plan-level attribute —
    no rand()/sample/nondeterministic UDF anywhere), probe and write
    are two evaluations of the same rows, so the probe runs directly
    against the lazy plan with no extra materialization.  Only a
    nondeterministic plan is PERSISTED across probe+write so both see
    the SAME evaluation — without that, a sampling upstream could pass
    a sentinel-free probe and then re-evaluate to a poisoned write
    (r12 review); the persist's spill cost for frames beyond storage
    memory is confined to that case (r12 ADVICE).  Catalyst's flag
    only checks EXPRESSION determinism, so plans that are row-SET
    nondeterministic without any nondeterministic expression — LIMIT
    (even sorted: ties on a non-unique sort key are free to differ
    between evaluations), SAMPLE/TAIL, and Deduplicate/Offset nodes
    (dropDuplicates may keep a DIFFERENT representative per evaluation;
    r13+r14 ADVICE closed the reopened r12 hole) — also take the
    persist path; those frames are limit/sample/key-bounded, so the
    persist is cheap by construction.  Pass
    ``validate_sentinel=False`` when the corpus contract already rules
    the sentinel out and even the probe's extra scan is unwanted in a
    scan-bound hot path.
    """
    if validate_sentinel:
        from functools import reduce

        from pyspark.sql import functions as F
        from pyspark.sql.types import StringType

        str_cols = [
            f.name for f in df.schema.fields if isinstance(f.dataType, StringType)
        ]
        if str_cols:
            try:
                analyzed = df._jdf.queryExecution().analyzed()
                deterministic = bool(analyzed.deterministic())
                if deterministic:
                    # row-set nondeterminism Catalyst's expression-level
                    # flag cannot see: LIMIT/SAMPLE/TAIL may pick
                    # different rows per evaluation even when every
                    # expression is deterministic, and Deduplicate
                    # (dropDuplicates) / Offset are free to keep a
                    # different representative / skip different rows
                    # between the probe and the write (r14 ADVICE —
                    # same probe-then-poisoned-write hole class; both
                    # are bounded or key-bounded, so the persist stays
                    # cheap).  Match node names at tree positions only
                    # (a column literally named "sample_..." appears
                    # inside [...] attribute lists, never at a node
                    # head) — a false positive merely persists a
                    # bounded frame.
                    import re

                    tree = analyzed.treeString()
                    if re.search(
                        r"(?m)^[\s:+\-*()0-9]*(GlobalLimit|LocalLimit"
                        r"|Sample|Tail|Deduplicate|Offset)\b",
                        tree,
                    ):
                        deterministic = False
            except Exception:
                deterministic = False  # unknown -> the safe (persist) path
            collision = reduce(
                lambda a, b: a | b,
                (F.col(c) == F.lit(_CSV_NULL) for c in str_cols),
            )
            if not deterministic:
                df = df.persist()
            try:
                if not df.where(collision).isEmpty():
                    raise ValueError(
                        f"write_csv: a string cell equals the NULL sentinel "
                        f"{_CSV_NULL!r} and would silently read back as NULL; "
                        "clean the column or write parquet/JSON instead"
                    )
                df.write.mode("overwrite").option("header", "true").option(
                    "emptyValue", '""'
                ).option("nullValue", _CSV_NULL).csv(path)
            finally:
                if not deterministic:
                    df.unpersist()
            return
    df.write.mode("overwrite").option("header", "true").option(
        "emptyValue", '""'
    ).option("nullValue", _CSV_NULL).csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("emptyValue", "")
        .option("nullValue", _CSV_NULL)
        .csv(path)
    )


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_xml(df: DataFrame, path: str) -> None:
    """Spark 4 native XML sink (built-in since 4.0; no external jar)."""
    df.write.mode("overwrite").format("xml").option("rowTag", "row").save(path)


def read_xml(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Schema-explicit XML read — inference would both add a pass and
    widen integer types (XML carries no type info)."""
    return (
        spark.read.schema(schema).format("xml").option("rowTag", "row").load(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
