"""Property-based tests (hypothesis): structural invariants under random inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from real_time_crypto_market_data_pipeline_spark.operators import metrics as M
from real_time_crypto_market_data_pipeline_spark.operators import text as T

_slow = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=20_000),
        st.floats(min_value=-100, max_value=100, allow_nan=False),
    ),
    min_size=1,
    max_size=40,
)


@given(events_strategy)
@_slow
def test_window_never_holds_stale_elements(spark, rows):
    """Range-window count never includes elements older than window_ms
    (the deque eviction invariant, rolling.py:67-73)."""
    df = spark.createDataFrame(
        [(k, i, ms, v) for i, (k, ms, v) in enumerate(rows)],
        "key STRING, i LONG, ms LONG, v DOUBLE",
    )
    out = M.sliding_range_stats(df, ["key"], "ms", "v", window_ms=5000, tiebreak_col="i")
    for r in out.collect():
        expected = sum(
            1 for (k, ms, _) in rows if k == r.key and r.ms - 5000 <= ms <= r.ms
        )
        assert r.w_count == expected


@given(events_strategy)
@_slow
def test_lag_diff_count_conservation(spark, rows):
    """lag_diff emits exactly n_k - 1 rows per key (first suppressed)."""
    df = spark.createDataFrame(
        [(k, i, ms) for i, (k, ms, _) in enumerate(rows)],
        "key STRING, i LONG, ms LONG",
    )
    out = M.lag_diff(df, ["key"], "ms", "i")
    per_key = {}
    for k, _, _ in rows:
        per_key[k] = per_key.get(k, 0) + 1
    assert out.count() == sum(n - 1 for n in per_key.values())


@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from("ab c"),
            min_size=0,
            max_size=30,
        ),
        min_size=1,
        max_size=10,
    )
)
@_slow
def test_token_count_conservation(spark, texts):
    """Sum of token frequencies == total non-empty whitespace tokens."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    total_tokens = sum(len([w for w in t.lower().split(" ") if w]) for t in texts)
    stats = T.token_stats(df).collect()
    assert sum(r.n for r in stats) == total_tokens


@given(
    st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    )
)
@_slow
def test_minhash_matches_pure_python_reference(spark, token_lists):
    """Spark MinHash signatures equal an independent pure-Python
    implementation of the same definition (md5(seed|shingle) min)."""
    import hashlib

    from real_time_crypto_market_data_pipeline_spark.operators import dedup as D

    texts = [" ".join(toks) for toks in token_lists]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    got = {}
    for r in D.minhash_signatures(df).collect():
        got.setdefault(r.doc_id, {})[r.seed] = r.sig

    for i, toks in enumerate(token_lists):
        shingles = [
            " ".join(toks[j : j + 3]) for j in range(len(toks) - 2)
        ] if len(toks) >= 3 else []
        if not shingles:
            assert i not in got
            continue
        for seed in range(8):
            expect = min(
                hashlib.md5(f"{seed}|{s}".encode()).hexdigest() for s in shingles
            )
            assert got[i][seed] == expect
