"""Text expression builders — all JVM built-ins (split/transform/
filter/md5), no Python UDFs, so they stay inside whole-stage codegen
at 100 TB.

Hashing is md5 (not xxhash64/F.hash) wherever the result must be
verifiable cross-engine: md5 is bit-identical in Spark and DuckDB,
while each engine's native hash function is engine-specific. The
reference pins its own hash for the same reason — bucket determinism
(wang_hash, /root/reference/dpu/shared/kernels/partition.c:20-28).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

# Corpus-curation constants shared by quality_score, pipeline_corpus,
# and the run_pipeline CLI (single source of truth; llm/pipeline.py and
# llm/text_analysis.py both import these).
MIN_TOKENS = 20
MAX_TOKENS = 2000
EVAL_HEX = ("0", "1", "2", "3")  # first md5(fp) nibble -> ~25% eval


def tokens(text: Column) -> Column:
    """Whitespace tokens; test corpus is single-space separated."""
    return F.split(text, " ")


def shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles: slice(toks, i, n) for i in 1..len-n+1.
    Caller must guard size(toks) >= n (sequence() would run backwards)."""
    return F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


def stopword_hits(toks: Column, words: tuple[str, ...] = STOPWORDS) -> Column:
    """Count of tokens that are stopwords (higher-order filter, JVM-side)."""
    wordset = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wordset, t)))


def base_hash60(col: Column) -> Column:
    """Deterministic 60-bit integer hash: first 15 hex chars of md5.
    Cross-engine twin: DuckDB `CAST(concat('0x', substr(md5(x),1,15))
    AS BIGINT)`. One md5 per value; MinHash lanes derive from this via
    cheap XOR constants instead of K separate md5 evaluations."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def lane_constants(k: int) -> list[int]:
    """K fixed 60-bit XOR constants (golden-ratio multiples — any fixed
    distinct values work; XOR by a constant is a bijection, so the min
    over XORed hashes is a valid per-lane min-hash)."""
    return [(i * 0x9E3779B97F4A7C15) % (1 << 60) for i in range(k)]
