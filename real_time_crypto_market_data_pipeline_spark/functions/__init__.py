"""Column-level function library: reusable expressions, no DataFrames.

The engine's scalar/array vocabulary, importable independently of the
operators that compose them:

    from real_time_crypto_market_data_pipeline_spark.functions import cosine_sim, tokens_col
"""

from ..operators.normalize import date_partition_col
from ..operators.similarity import cosine_sim, dot, l2_norm
from ..operators.text import STOPWORDS, tokens_col, word_shingles

__all__ = [
    "STOPWORDS",
    "cosine_sim",
    "date_partition_col",
    "dot",
    "l2_norm",
    "tokens_col",
    "word_shingles",
]
