"""Query plans: importing this package populates the registry."""

from . import capability_queries, core_queries, ext_queries, relational_queries  # noqa: F401
from .registry import BENCH_EXTRA_KEYS, BENCH_KEYS, ORACLES, QUERIES, prepare

__all__ = ["QUERIES", "ORACLES", "BENCH_KEYS", "BENCH_EXTRA_KEYS", "prepare"]
