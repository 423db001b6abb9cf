#!/usr/bin/env python
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}.

Each query is forced through full materialization with the noop sink
(no driver-side collect — same discipline as production). A warmup
query first absorbs JVM/codegen startup so per-query numbers measure
the plans, not the JIT.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dpu_olap_spark.registry import all_queries
from dpu_olap_spark.session import get_spark

HEADLINE = [
    # reference parity
    "filter",
    "sum",
    "take",
    "partition",
    "join",
    "join_agg",
    # relational
    "group_agg",
    "topk",
    "window_rank",
    "multi_join_agg",
    "distinct_agg",
    "tpch_q3",
    "tpch_q6",
    "tpch_q10",
    "merge_upsert",
    "asof_join",
    "range_join",
    "decorrelated_subquery",
    # data-pipeline ops
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_clusters",
    "knn_bruteforce",
    "ann_lsh",
    "text_stats",
    "token_hist",
    "tfidf_top_terms",
    "pipeline_corpus",
    "window_sliding",
    "stateful_user_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    spark = get_spark("dpu-olap-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # warmup: JVM + codegen + parquet footer caches, and the Python
    # worker pool (Arrow serializers) so one-time process spin-up isn't
    # charged to whichever Python-path query happens to run first
    queries["sum"].build(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def _noop_pandas(batches):
        yield from batches

    spark.range(10_000).repartition(32).mapInPandas(
        _noop_pandas, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        queries[name].build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
