#!/usr/bin/env python
"""Run the full training-corpus pipeline and WRITE the curated corpus:
normalize -> length gate -> exact dedup -> hash train/eval split ->
partitioned parquet, laid out by (subset, lang) for downstream
partition pruning.

Usage: python tools/run_pipeline.py [sf_dir] [out_dir]

This is the runnable composition of the engine's verified operators
(`pipeline_corpus` computes the same accounting without writing).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dpu_olap_spark.llm.pipeline import curate
from dpu_olap_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_corpus"
    spark = get_spark("run-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = curate(spark, sf_dir)
    corpus.write.mode("overwrite").partitionBy("subset", "lang").parquet(out_dir)
    stats = (
        spark.read.parquet(out_dir)
        .groupBy("subset")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("tokens"))
        .collect()
    )
    print(
        json.dumps(
            {
                "out": out_dir,
                "subsets": {r.subset: {"docs": r.n_docs, "tokens": r.tokens} for r in stats},
            }
        )
    )


if __name__ == "__main__":
    main()
