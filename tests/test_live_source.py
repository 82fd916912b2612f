"""Live-mode WebSocket reader driven over a fake in-process transport.

The container has no ``websockets`` package and no network, so live
mode can't run for real - but ``LiveOkxStreamReader`` only touches the
library through ``websockets.sync.client.connect`` and the returned
connection's ``send``/``recv``. Injecting a fake module into
``sys.modules`` lets every reference behavior execute and be asserted:

- S1 subscribe cross-product sent on connect (okx_ws.py:43-63)
- S2 reconnect with backoff on both connect failure and mid-read drop
  (okx_ws.py:96-103)
- S3 keepalive/flow-control parameters: ping 20 s / ping timeout 10 s /
  open 10 s / close 5 s / bounded queue 1024 (okx_ws.py:50-57)
- S4 receive-time stamping before decode, monotone stamps
  (okx_ws.py:67-69)
"""

from __future__ import annotations

import json
import sys
import types

import pytest

from real_time_crypto_market_data_pipeline_spark.sources.okx_ws import (
    BackoffPolicy,
    LiveOkxStreamReader,
)


class FakeConnection:
    def __init__(self, frames, fail_after=None):
        self.sent: list[str] = []
        self._frames = list(frames)
        self._fail_after = fail_after
        self._delivered = 0

    def send(self, payload: str) -> None:
        self.sent.append(payload)

    def recv(self, timeout=None):
        if self._fail_after is not None and self._delivered >= self._fail_after:
            self._fail_after = None
            raise OSError("connection dropped")
        if not self._frames:
            raise TimeoutError
        self._delivered += 1
        return self._frames.pop(0)


class FakeTransport:
    """Stands in for ``websockets.sync.client``."""

    def __init__(self):
        self.connect_kwargs: list[dict] = []
        self.connections: list[FakeConnection] = []
        self._plan: list = []  # each entry: FakeConnection or OSError

    def plan(self, *entries) -> None:
        self._plan.extend(entries)

    def connect(self, url, **kwargs):
        self.connect_kwargs.append({"url": url, **kwargs})
        nxt = self._plan.pop(0)
        if isinstance(nxt, Exception):
            raise nxt
        self.connections.append(nxt)
        return nxt


@pytest.fixture()
def transport(monkeypatch):
    fake = FakeTransport()
    root = types.ModuleType("websockets")
    sync = types.ModuleType("websockets.sync")
    client = types.ModuleType("websockets.sync.client")
    client.connect = fake.connect
    root.sync = sync
    sync.client = client
    monkeypatch.setitem(sys.modules, "websockets", root)
    monkeypatch.setitem(sys.modules, "websockets.sync", sync)
    monkeypatch.setitem(sys.modules, "websockets.sync.client", client)
    return fake


def _reader(**options) -> LiveOkxStreamReader:
    r = LiveOkxStreamReader(options)
    # zero the backoff so reconnect tests don't sleep
    r.backoff = BackoffPolicy(base=0.0, cap=0.0)
    return r


def test_connect_uses_reference_keepalive_params(transport):
    """S3: the exact okx_ws.py:50-57 keepalive/flow-control settings."""
    transport.plan(FakeConnection([]))
    r = _reader(url="wss://example/ws", symbols="BTC-USDT", channels="books5")
    rows, end = r.read(r.initialOffset())
    assert list(rows) == [] and end == {"frame": 0}
    [kw] = transport.connect_kwargs
    assert kw == {
        "url": "wss://example/ws",
        "open_timeout": 10,
        "close_timeout": 5,
        "ping_interval": 20,
        "ping_timeout": 10,
        "max_queue": 1024,
    }


def test_subscribe_cross_product_sent_on_connect(transport):
    """S1: one subscribe op covering symbols x channels."""
    transport.plan(FakeConnection([]))
    r = _reader(symbols="BTC-USDT, ETH-USDT", channels="books5,trades")
    r.read(r.initialOffset())
    [conn] = transport.connections
    [payload] = conn.sent
    msg = json.loads(payload)
    assert msg["op"] == "subscribe"
    assert msg["args"] == [
        {"channel": "books5", "instId": "BTC-USDT"},
        {"channel": "books5", "instId": "ETH-USDT"},
        {"channel": "trades", "instId": "BTC-USDT"},
        {"channel": "trades", "instId": "ETH-USDT"},
    ]


def test_read_stamps_and_advances_offsets(transport):
    """S4: stamps taken on arrival, recv <= decode, offsets count frames;
    bytes frames decode with utf-8/replace."""
    transport.plan(FakeConnection(['{"a": 1}', b'{"b": 2}']))
    r = _reader()
    rows, end = r.read({"frame": 7})
    rows = list(rows)
    assert [row[0] for row in rows] == ['{"a": 1}', '{"b": 2}']
    assert end == {"frame": 9}  # 7 + 2 frames
    for _, recv_epoch_ms, recv_mono_ns, decoded_mono_ns in rows:
        assert recv_epoch_ms > 0
        assert recv_mono_ns <= decoded_mono_ns  # the S6 invariant at source
    # arrival order preserved by the monotonic stamps
    assert rows[0][2] <= rows[1][2]


def test_max_frames_per_trigger_caps_batch(transport):
    """Microbatch flow control: at most maxframespertrigger rows/read."""
    transport.plan(FakeConnection([f"f{i}" for i in range(10)]))
    r = _reader(maxframespertrigger="3")
    rows, end = r.read(r.initialOffset())
    assert len(list(rows)) == 3 and end == {"frame": 3}
    rows, end = r.read(end)
    assert len(list(rows)) == 3 and end == {"frame": 6}


def test_reconnect_after_connect_failures(transport):
    """S2: connect-time OSError retries with backoff until success."""
    good = FakeConnection(["hello"])
    transport.plan(OSError("refused"), OSError("refused"), good)
    r = _reader()
    rows, end = r.read(r.initialOffset())
    assert [row[0] for row in list(rows)] == ["hello"]
    assert len(transport.connect_kwargs) == 3  # two failures + success
    [payload] = good.sent  # subscribe sent on the surviving connection
    assert json.loads(payload)["op"] == "subscribe"


def test_reconnect_after_midread_drop_resubscribes(transport):
    """S2: a drop mid-read reconnects, re-subscribes, and keeps reading
    in the SAME microbatch - no frames lost, offsets stay contiguous."""
    first = FakeConnection(["f0", "f1", "never-sent"], fail_after=2)
    second = FakeConnection(["f2"])
    transport.plan(first, second)
    r = _reader()
    rows, end = r.read(r.initialOffset())
    got = [row[0] for row in list(rows)]
    assert got == ["f0", "f1", "f2"]
    assert end == {"frame": 3}
    assert len(transport.connections) == 2
    assert [json.loads(p)["op"] for p in second.sent] == ["subscribe"]


def test_missing_websockets_is_a_clear_error(monkeypatch):
    """Without the package the reader fails actionably, not obscurely."""
    for mod in ("websockets", "websockets.sync", "websockets.sync.client"):
        monkeypatch.delitem(sys.modules, mod, raising=False)
    monkeypatch.setattr(
        "builtins.__import__",
        _blocking_import(["websockets"]),
    )
    r = _reader()
    with pytest.raises(NotImplementedError, match="mode=replay"):
        r.read(r.initialOffset())


def _blocking_import(blocked_prefixes):
    real_import = __import__

    def guarded(name, *args, **kwargs):
        if any(name == p or name.startswith(p + ".") for p in blocked_prefixes):
            raise ImportError(f"No module named {name!r}")
        return real_import(name, *args, **kwargs)

    return guarded


def test_reconnect_backoff_sequence_exponential_capped(transport, monkeypatch):
    """S2 through the reader: repeated connect failures sleep the
    exponential-capped-jittered sequence min(30, 0.25*2^n)*[0.8,1.2]
    (reference okx_ws.py:96-103)."""
    transport.plan(*([OSError("refused")] * 9), FakeConnection(["x"]))
    slept: list[float] = []
    monkeypatch.setattr("time.sleep", slept.append)
    r = LiveOkxStreamReader({})  # real BackoffPolicy, not the zeroed one
    rows, _ = r.read(r.initialOffset())
    assert [row[0] for row in list(rows)] == ["x"]
    assert len(slept) == 9
    for n, d in enumerate(slept):
        nominal = min(30.0, 0.25 * (2**n))
        assert nominal * 0.8 <= d <= nominal * 1.2
    # the cap binds from attempt 7 on (0.25*2^7 = 32 > 30)
    assert slept[8] <= 30.0 * 1.2


def test_backoff_restarts_at_base_after_successful_connect(transport, monkeypatch):
    """After a successful (re)connect the attempt counter is back at
    zero: the next outage's first delay is in the base band again, not
    a continuation of the previous exponential run."""
    transport.plan(
        OSError("a"), OSError("b"), OSError("c"),
        FakeConnection(["f1", "never"], fail_after=1),
        OSError("d"),
        FakeConnection(["f2"]),
    )
    slept: list[float] = []
    monkeypatch.setattr("time.sleep", slept.append)
    r = LiveOkxStreamReader({})
    rows, _ = r.read(r.initialOffset())
    assert [row[0] for row in list(rows)] == ["f1", "f2"]
    assert len(transport.connections) == 2
    # first outage: 3 sleeps at attempts 0,1,2; second outage: 1 sleep
    # back at attempt 0 (NOT attempt 3's 2.0 s band)
    assert len(slept) == 4
    assert slept[3] <= 0.25 * 1.2
    assert slept[2] >= 1.0 * 0.8
