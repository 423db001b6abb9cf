"""Context-window preparation operators: sliding-window token
chunking and deterministic sequence packing.

These are the two transforms between a curated corpus and a training
dataloader: CHUNKING splits long documents into overlapping
fixed-token windows (so no training example exceeds the context
length and boundaries are seen twice), and PACKING assigns short
documents to fixed-token-budget bins (so a batch wastes no pad
tokens). The reference engine stops at relational ops; these extend
the same declarative style to the training-data layer (SURVEY.md
section 2.9 scope).

Scale shape:
- chunking is map-side only — tokenize, generate chunk starts,
  posexplode, slice; no shuffle at all. Output rows ~= corpus tokens
  / stride, each carrying a fingerprint rather than the chunk text.
- packing is one window partitioned by the shard key (lang, source):
  the running token total never crosses shards, so 10^6 shards pack
  in parallel and no global single-partition window exists. Bins are
  assigned by the EXCLUSIVE running sum's multiple of the budget —
  deterministic, order-stable (doc_id), and identical in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dpu_olap_spark.functions.text import tokens
from dpu_olap_spark.registry import query
from dpu_olap_spark.sources.tables import load_table

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks

PACK_BUDGET = 256  # tokens per packed bin


@query(
    "chunk_documents",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    starts AS (
      SELECT doc_id, t,
             unnest(generate_series(1, len(t), {CHUNK_STRIDE})) AS st
      FROM toks
    )
    SELECT doc_id,
           CAST((st - 1) // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           CAST(len(t[st:st + {CHUNK_TOKENS} - 1]) AS BIGINT) AS n_chunk_tokens,
           md5(array_to_string(t[st:st + {CHUNK_TOKENS} - 1], ' ')) AS chunk_fp
    FROM starts
    """,
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: every document becomes ceil(n/stride)
    chunks of up to CHUNK_TOKENS tokens starting every CHUNK_STRIDE
    (trailing chunks are shorter; consecutive chunks overlap by
    CHUNK_TOKENS - CHUNK_STRIDE tokens). Entirely map-side — the
    token array never leaves its input partition; rows carry an md5
    fingerprint of the chunk, not the text, so output width stays
    bounded at any corpus size."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens(F.col("text"))
    starts = docs.select(
        "doc_id",
        toks.alias("t"),
        F.explode(F.sequence(F.lit(1), F.size(toks), F.lit(CHUNK_STRIDE))).alias("st"),
    )
    chunk = F.slice(F.col("t"), F.col("st"), CHUNK_TOKENS)
    return starts.select(
        "doc_id",
        ((F.col("st") - 1) / CHUNK_STRIDE).cast("bigint").alias("chunk_id"),
        F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_fp"),
    )


@query(
    "pack_sequences",
    oracle=f"""
    WITH sized AS (
      SELECT lang, source, doc_id,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    offsets AS (
      SELECT lang, source, doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang, source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS tok_offset
      FROM sized
    )
    SELECT lang, source,
           CAST(tok_offset // {PACK_BUDGET} AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc_id
    FROM offsets
    GROUP BY lang, source, CAST(tok_offset // {PACK_BUDGET} AS BIGINT)
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing: within each (lang, source)
    shard, documents in doc_id order are assigned to the bin their
    EXCLUSIVE running token total falls in (floor(offset / budget)).
    A document spanning a budget boundary stays in the bin where it
    starts, so bins can spill slightly past the budget but never
    split a document — the streaming-friendly packing rule a
    dataloader can reproduce without coordination. One shuffle (the
    shard window); shards pack independently, so parallelism is the
    shard count, not 1."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "lang", "source", "doc_id", F.size(tokens(F.col("text"))).alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sized.withColumn(
        "tok_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return (
        offsets.groupBy(
            "lang",
            "source",
            F.floor(F.col("tok_offset") / PACK_BUDGET).cast("bigint").alias("bin_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
            F.min("doc_id").cast("bigint").alias("first_doc_id"),
        )
    )
