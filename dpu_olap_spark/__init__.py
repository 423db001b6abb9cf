"""dpu_olap_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the query capabilities of the reference
OLAP operator suite (upmem/dpu_olap): filter, take (gather),
sum-aggregate, hash partition, and partitioned PK-FK hash join
(reference: host/{filter,take,aggr,partition,join}/), plus the
standard relational surface the reference omits (grouped aggregation,
windows, set ops, sorts) and large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing).

Design rules (100 TB discipline):
- Declarative DataFrame/SQL plans; Catalyst + AQE pick physical
  strategies. No RDDs, no collect() in data paths.
- Broadcast small dimensions, shuffle-hash/sort-merge large joins.
- Built-in JVM functions in hot paths; Arrow-batched pandas UDFs only
  where built-ins cannot express the semantics.
"""

from dpu_olap_spark.registry import Query, all_queries, get_query, oracle_map, query

__all__ = ["Query", "all_queries", "get_query", "oracle_map", "query"]
__version__ = "0.1.0"
