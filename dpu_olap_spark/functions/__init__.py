from dpu_olap_spark.functions.text import shingles, stopword_hits, tokens
from dpu_olap_spark.functions.vectors import cosine_sim, dot, l2_norm, sign_bucket

__all__ = ["tokens", "shingles", "stopword_hits", "cosine_sim", "dot", "l2_norm", "sign_bucket"]
