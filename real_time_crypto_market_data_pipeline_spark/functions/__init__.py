"""Column-level function library: the engine's scalar/array vocabulary,
importable independently of the operators that compose it."""

from ..operators.normalize import date_partition_col
from ..operators.similarity import cosine_sim, dot, l2_norm
from ..operators.text import STOPWORDS, tokens_col, word_shingles

__all__ = ["STOPWORDS", "cosine_sim", "date_partition_col", "dot",
           "l2_norm", "tokens_col", "word_shingles"]
