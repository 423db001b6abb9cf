"""Custom connector via the Python Data Source API (Spark 4): the
extensibility seam for reading systems Spark has no built-in source
for (internal services, bespoke formats, synthetic generators).

The reference generates all of its data in memory per benchmark
(host/generator/generator.cc:22-71); this source is that generator
re-expressed as a PARTITIONED, schema-declared Spark source: the
driver plans one InputPartition per slice and executors materialize
rows in parallel — the same batch-per-device round-robin the
reference's host loop hand-schedules (host/filter/filter_dpu.cc:128).

Determinism contract: row content is a pure function of the row id
(multiplicative hashing), so the DuckDB oracle regenerates the same
relation from range() and the comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dpu_olap_spark.registry import query

_N_ROWS = 40_000
_N_PARTS = 8
# Knuth multiplicative hash constant; products stay < 2^47 for
# id < 40k, exact in int64 on both engines.
_MULT = 2654435761
_MOD = 997


def _make_source():
    """Build the DataSource class lazily (import needs pyspark 4) and
    define it locally so cloudpickle ships it BY VALUE — the reader
    runs on executors that may not have this module imported yet."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    n_rows, n_parts, mult, mod = _N_ROWS, _N_PARTS, _MULT, _MOD

    class SynthMetricsReader(DataSourceReader):
        def partitions(self):
            step = n_rows // n_parts
            return [
                InputPartition((i * step, min((i + 1) * step, n_rows)))
                for i in range(n_parts)
            ]

        def read(self, partition):
            lo, hi = partition.value
            for i in range(lo, hi):
                yield (i, i % 16, (i * mult) % mod)

    class SynthMetricsSource(DataSource):
        @classmethod
        def name(cls):
            return "synth_metrics"

        def schema(self):
            return "id bigint, bucket int, metric bigint"

        def reader(self, schema):
            return SynthMetricsReader()

    return SynthMetricsSource


@query(
    "pysource_scan",
    oracle=f"""
    SELECT CAST(id % 16 AS INT) AS bucket,
           COUNT(*) AS n_rows,
           CAST(SUM((id * {_MULT}) % {_MOD}) AS BIGINT) AS sum_metric,
           CAST(MAX((id * {_MULT}) % {_MOD}) AS BIGINT) AS max_metric
    FROM range({_N_ROWS}) t(id)
    GROUP BY 1
    """,
)
def q_pysource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + aggregate over the custom Python data source: 8 planned
    InputPartitions read in parallel on executors (the connector's
    scale contract — partition count is the parallelism, exactly like
    parquet splits), rows flow through Arrow into the JVM, and the
    aggregation is ordinary partial+final over the scan. The oracle
    regenerates the deterministic content from range(): equality
    proves the connector delivers every partition exactly once —
    the reference's generator-vs-engine differential
    (host/generator/generator.cc:22-71) in Spark terms."""
    # register unconditionally: registration replaces idempotently, and
    # caching on session identity risks id()-reuse collisions
    spark.dataSource.register(_make_source())
    df = spark.read.format("synth_metrics").load()
    return df.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("metric").cast("bigint").alias("sum_metric"),
        F.max("metric").cast("bigint").alias("max_metric"),
    )
