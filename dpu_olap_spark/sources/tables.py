"""Parquet table loader for the driver-provided TPC-H-ish testdata.

The reference has no storage layer at all — data is generated in
memory per benchmark (host/generator/generator.cc:22-71). Our scan is
`spark.read.parquet`, which at 100 TB gives us predicate pushdown,
column pruning, and partition pruning for free; tests assert the
pushdown actually reaches the scan (tests/test_plans.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at any realistic scale factor.
# (region/nation are bounded by geography; supplier/part/customer grow
# with SF but stay << fact tables — at 100 TB those three would be
# bucketed instead; see plans/notes.md.)
BROADCAST_DIMS = ("region", "nation", "supplier")


# events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
# rejects. We read nanos as long (spark.sql.legacy.parquet.nanosAsLong,
# set in session._CONFS) and truncate to microseconds — the same floor
# the DuckDB oracle applies when casting TIMESTAMP_NS -> TIMESTAMP.
_NANO_TS_COLS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return _restore_nano_ts(df, name)


def _restore_nano_ts(df: DataFrame, name: str) -> DataFrame:
    from pyspark.sql import functions as F

    for col in _NANO_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() queries work."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
