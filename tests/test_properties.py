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

    from tests import _reference_impls as R

    texts = [" ".join(toks) for toks in token_lists]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    got = {}
    for r in R.minhash_signatures(df).collect():
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


# --- normalizer fuzz: random garbage never throws; survivors are well-formed

json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-10**12, max_value=10**12),
    st.text(max_size=8),
)
level_strategy = st.lists(
    st.one_of(st.text(max_size=6), st.from_regex(r"[0-9]{1,5}\.[0-9]{1,2}", fullmatch=True)),
    max_size=5,
)
item_strategy = st.fixed_dictionaries(
    {},
    optional={
        "ts": st.one_of(json_scalars, st.from_regex(r"[0-9]{1,13}", fullmatch=True)),
        "px": st.one_of(json_scalars),
        "sz": st.one_of(json_scalars),
        "side": st.sampled_from(["buy", "sell", "", "x"]),
        "tradeId": st.text(max_size=6),
        "bids": st.lists(level_strategy, max_size=3),
        "asks": st.lists(level_strategy, max_size=3),
    },
)
frame_strategy = st.one_of(
    st.text(max_size=20),  # raw garbage
    st.fixed_dictionaries(
        {},
        optional={
            "event": st.sampled_from(["subscribe", "unsubscribe", "error", "data", ""]),
            "arg": st.one_of(
                json_scalars,
                st.fixed_dictionaries(
                    {},
                    optional={
                        "channel": st.sampled_from(["books5", "trades", "tickers", ""]),
                        "instId": st.one_of(st.none(), st.text(max_size=8)),
                    },
                ),
            ),
            "data": st.one_of(json_scalars, st.lists(item_strategy, max_size=3)),
        },
    ).map(lambda d: __import__("json").dumps(d)),
)


@given(st.lists(frame_strategy, min_size=1, max_size=15))
@_slow
def test_normalizer_never_throws_on_garbage(spark, frames):
    """Fuzz: arbitrary frame bytes produce a valid (possibly empty)
    event table - no exceptions, and every survivor satisfies the
    union-payload and field-presence invariants (FIXTURES.md A4)."""
    from real_time_crypto_market_data_pipeline_spark.operators import normalize as N

    df = spark.createDataFrame(
        [(f, 1735689600000 + i, 10**9 + i, 10**9 + 500 + i) for i, f in enumerate(frames)],
        "raw STRING, ts_recv_epoch_ms LONG, ts_recv_mono_ns LONG, ts_decoded_mono_ns LONG",
    )
    events = N.normalize_frames(df).collect()  # must not raise
    for ev in events:
        assert ev.exchange == "okx"
        assert ev.channel in ("books5", "trades")
        assert ev.symbol  # instId was present and non-null
        assert ev.ts_exchange_ms is not None  # ts parsed
        if ev.event_type == "book_topn":
            assert ev.book is not None and ev.trade is None
            for side in (ev.book.bids, ev.book.asks):
                for lv in side:
                    assert lv.price is not None and lv.size is not None
        else:
            assert ev.event_type == "trade"
            assert ev.trade is not None and ev.book is None
            assert ev.trade.price is not None and ev.trade.size is not None


cents_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        # 2-decimal grid values, the events.value domain
        st.integers(min_value=-10_000, max_value=10_000).map(lambda c: c / 100.0),
    ),
    min_size=1,
    max_size=50,
)


@given(cents_strategy)
@_slow
def test_exact_stats_match_reference_formula(spark, rows):
    """grouped_stats_exact == the plain double-path stats to float
    tolerance on any 2-decimal input, including the n=1 -> std 0.0
    fallback - the exact path changes determinism, never semantics."""
    import math

    df = spark.createDataFrame(rows, "key STRING, v DOUBLE")
    exact = {
        r.key: r
        for r in M.grouped_stats_exact(
            df, ["key"], "v", "s_", scale=100, sum_dtype="long"
        ).collect()
    }
    from tests._reference_impls import plain_grouped_stats

    plain = {r.key: r for r in plain_grouped_stats(df, ["key"], "v", "s_").collect()}
    assert set(exact) == set(plain)
    for k, e in exact.items():
        p = plain[k]
        assert e.s_count == p.s_count
        assert e.s_min == p.s_min and e.s_max == p.s_max
        assert math.isclose(e.s_mean, p.s_mean, rel_tol=1e-9, abs_tol=1e-9)
        assert math.isclose(e.s_std, p.s_std, rel_tol=1e-6, abs_tol=1e-9)
        if e.s_count == 1:
            assert e.s_std == 0.0


def test_funnel_stage_times_monotone(spark):
    """Strict-order funnel invariant: whenever a later stage time is
    present, it is >= every earlier stage time, and stages_reached
    encodes exactly which times are present."""
    from real_time_crypto_market_data_pipeline_spark.plans import QUERIES

    rows = QUERIES["q_funnel"](spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.t_view is not None
        if r.t_click is not None:
            assert r.t_click >= r.t_view
        if r.t_purchase is not None:
            assert r.t_click is not None and r.t_purchase >= r.t_click
        want = 3 if r.t_purchase is not None else 2 if r.t_click is not None else 1
        assert r.stages_reached == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=65535),
            st.integers(min_value=0, max_value=65535),
        ),
        min_size=1,
        max_size=50,
        unique=True,
    )
)
@settings(max_examples=30, deadline=None)
def test_zorder_interleave_is_invertible(pairs):
    """The Morton key is a bijection on (x, y): de-interleaving the
    engine's bit formula recovers both coordinates, so sorting by zkey
    loses no information (pure pre-python check of the q_zorder_key
    bit logic - the Spark/DuckDB twin parity is the oracle test)."""
    for x, y in pairs:
        z = sum(
            (((x >> i) & 1) << (2 * i)) + (((y >> i) & 1) << (2 * i + 1))
            for i in range(16)
        )
        rx = sum(((z >> (2 * i)) & 1) << i for i in range(16))
        ry = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (rx, ry) == (x, y)


pack_strategy = st.lists(
    st.integers(min_value=1, max_value=100),  # chunk_len
    min_size=1,
    max_size=60,
)


@given(pack_strategy, st.integers(min_value=16, max_value=128))
@_slow
def test_pack_sequences_matches_python_replay(spark, lens, budget):
    """pack_sequences on arbitrary chunk lengths == a pure-Python
    replay of the streaming-fill rule (bin = cum_before DIV budget,
    per md5 bucket in (doc_id, chunk_id) order), with every chunk
    assigned exactly once regardless of input partitioning."""
    rows = [(i // 5, i % 5, ln) for i, ln in enumerate(lens)]
    df = spark.createDataFrame(
        rows, "doc_id LONG, chunk_id INT, chunk_len LONG"
    ).repartition(7)  # layout must not affect the assignment
    out = T.pack_sequences(df, budget_tokens=budget, num_buckets=3).collect()

    assert sorted((r.doc_id, r.chunk_id) for r in out) == sorted(
        (d, c) for d, c, _ in rows
    )
    by_bucket = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_id)):
        by_bucket.setdefault(r.bucket, []).append(r)
    for rs in by_bucket.values():
        cum = 0
        for r in rs:
            assert r.bin == cum // budget
            cum += r.chunk_len


vec_strategy = st.lists(
    st.lists(
        st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, width=32),
        min_size=1,
        max_size=16,
    ),
    min_size=1,
    max_size=20,
)


@given(vec_strategy)
@_slow
def test_quantize_int8_error_bound(spark, vecs):
    """Symmetric int8 quantization invariants on arbitrary vectors:
    per-component reconstruction error is at most half a code step
    (amax/254), so mse <= (amax/254)^2; the integer checksum is
    bounded by 127*dims; all-zero vectors quantize losslessly."""
    from real_time_crypto_market_data_pipeline_spark.operators.similarity import (
        scalar_quantize_int8,
    )

    df = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    for r in scalar_quantize_int8(df).collect():
        assert r.dims == len(vecs[r.vec_id])
        assert abs(r.code_sum) <= 127 * r.dims
        if r.amax == 0.0:
            assert r.code_sum == 0 and r.mse == 0.0
        else:
            step_half = r.amax / 254.0
            assert r.mse <= step_half * step_half * (1 + 1e-9)


vec_strategy = st.lists(
    st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
                       width=32),
             min_size=8, max_size=8),
    min_size=1, max_size=30,
)


@given(vec_strategy)
@settings(max_examples=50, deadline=None)
def test_sq8_quantizer_idempotent_on_own_dequants(vecs):
    """Codes-on-disk keystone (r11): re-quantizing a dequantized wire
    value reproduces the CODES exactly for any doubles (the max code
    is 127 and a <=1-ulp amax wobble cannot move floor(q +- tiny +
    0.5)); for float32-width inputs - the embeddings tables are
    array<float> - the AMAX and the wire value are bit-for-bit fixed
    points too, because 127*x is exact in float64 when x carries <= 24
    significand bits, so (127*x)/127 == x (NOT true for arbitrary
    doubles: ~2% of random float64 miss by one ulp - measured). Note
    production bit-equality between codes_col and transport='int8'
    does not ride on idempotency at all: both paths dequantize the
    SAME stored codes with the same op order and never re-quantize.
    Also pins the hard bounds: codes in [-127, 127], amax >= 0, zero
    rows -> zero codes with amax 0."""
    import numpy as np

    from real_time_crypto_market_data_pipeline_spark.operators.similarity import (
        _sq8_quant_np)

    V = np.asarray(vecs, dtype=np.float64)  # float32-width by strategy
    q1, amax1 = _sq8_quant_np(V)
    assert q1.dtype == np.int8 and (np.abs(q1.astype(np.int64)) <= 127).all()
    assert (amax1 >= 0).all()
    zero = np.abs(V).max(axis=1) == 0
    assert (q1[zero] == 0).all() and (amax1[zero] == 0).all()
    deq = q1.astype(np.float64) * amax1[:, None] / 127.0  # the _q8_mat op order
    q2, amax2 = _sq8_quant_np(deq)
    assert (q1 == q2).all()  # code idempotency: holds for ANY doubles
    assert (amax1 == amax2).all()  # bit-equal - float32-width inputs only
    deq2 = q2.astype(np.float64) * amax2[:, None] / 127.0
    assert (deq == deq2).all()  # the wire value is a fixed point
    # and the code claim survives full-precision doubles:
    rng = np.random.default_rng(hash(V.tobytes()) % 2**32)
    W = rng.standard_normal(V.shape) * 1e3
    qa, ama = _sq8_quant_np(W)
    qb, _ = _sq8_quant_np(qa.astype(np.float64) * ama[:, None] / 127.0)
    assert (qa == qb).all()
