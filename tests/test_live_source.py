"""Live WebSocket reader logic up to the socket boundary (S1-S4).

The real ``websockets`` package is absent in this environment; a fake
module injected into sys.modules drives LiveOkxStreamReader through
connect -> subscribe -> recv -> timeout -> reconnect, verifying the
reference-parity behaviors: one subscribe op with the cross product,
receive-before-decode stamping, offset advancement, and backoff-driven
reconnect on connection errors."""

from __future__ import annotations

import json
import sys
import types

import pytest

from real_time_crypto_market_data_pipeline_spark.sources.okx_ws import (
    LiveOkxStreamReader,
)


class FakeSocket:
    def __init__(self, frames):
        self.frames = list(frames)
        self.sent = []
        self.closed = False

    def send(self, payload):
        self.sent.append(payload)

    def recv(self, timeout=None):
        if not self.frames:
            raise TimeoutError
        item = self.frames.pop(0)
        if isinstance(item, Exception):
            raise item
        return item


@pytest.fixture()
def fake_ws(monkeypatch):
    sockets = []

    def connect(url, **kwargs):
        sock = FakeSocket(connect.frames_per_socket.pop(0))
        sock.url = url
        sock.kwargs = kwargs
        sockets.append(sock)
        return sock

    connect.frames_per_socket = []
    mod = types.ModuleType("websockets")
    client = types.ModuleType("websockets.sync.client")
    client.connect = connect
    sync = types.ModuleType("websockets.sync")
    sync.client = client
    mod.sync = sync
    monkeypatch.setitem(sys.modules, "websockets", mod)
    monkeypatch.setitem(sys.modules, "websockets.sync", sync)
    monkeypatch.setitem(sys.modules, "websockets.sync.client", client)
    return connect, sockets


def make_reader(**opts):
    defaults = {"symbols": "BTC-USDT,ETH-USDT", "channels": "books5,trades"}
    defaults.update(opts)
    return LiveOkxStreamReader(defaults)


def test_connect_sends_single_subscribe_cross_product(fake_ws):
    connect, sockets = fake_ws
    connect.frames_per_socket = [['{"a": 1}']]
    reader = make_reader()
    rows, offset = reader.read({"frame": 0})
    rows = list(rows)
    assert len(sockets) == 1
    subscribe = json.loads(sockets[0].sent[0])
    assert subscribe["op"] == "subscribe"
    assert len(subscribe["args"]) == 4  # 2 symbols x 2 channels
    assert offset == {"frame": 1}
    assert rows[0][0] == '{"a": 1}'


def test_stamps_are_monotone_per_frame(fake_ws):
    connect, _ = fake_ws
    connect.frames_per_socket = [['{"a":1}', b'{"b":2}']]
    rows, _ = make_reader().read({"frame": 0})
    for raw, recv_epoch_ms, recv_mono_ns, decoded_mono_ns in rows:
        assert isinstance(raw, str)  # bytes decoded to str
        assert decoded_mono_ns >= recv_mono_ns  # S6 invariant at source
        assert recv_epoch_ms > 1_600_000_000_000


def test_timeout_ends_batch_and_offset_advances(fake_ws):
    connect, _ = fake_ws
    connect.frames_per_socket = [["f1", "f2"]]  # then TimeoutError
    reader = make_reader(maxframespertrigger="10")
    rows, offset = reader.read({"frame": 5})
    assert len(list(rows)) == 2
    assert offset == {"frame": 7}


def test_reconnects_after_connection_error(fake_ws, monkeypatch):
    connect, sockets = fake_ws
    # first socket dies mid-read; reader reconnects and drains socket 2
    connect.frames_per_socket = [["f1", OSError("gone")], ["f2"]]
    monkeypatch.setattr("time.sleep", lambda s: None)  # skip backoff wait
    reader = make_reader()
    rows, offset = reader.read({"frame": 0})
    assert [r[0] for r in rows] == ["f1", "f2"]
    assert len(sockets) == 2  # reconnected
    assert json.loads(sockets[1].sent[0])["op"] == "subscribe"  # re-subscribed


def test_max_frames_per_trigger_caps_batch(fake_ws):
    connect, _ = fake_ws
    connect.frames_per_socket = [["a", "b", "c", "d"]]
    reader = make_reader(maxframespertrigger="2")
    rows, offset = reader.read({"frame": 0})
    assert len(list(rows)) == 2  # S3 backpressure cap
    assert offset == {"frame": 2}


def test_connection_options_match_reference(fake_ws):
    """S3: keepalive/flow-control parameters (okx_ws.py:50-57 parity)."""
    connect, sockets = fake_ws
    connect.frames_per_socket = [["x"]]
    make_reader().read({"frame": 0})
    kw = sockets[0].kwargs
    assert kw["ping_interval"] == 20
    assert kw["ping_timeout"] == 10
    assert kw["open_timeout"] == 10
    assert kw["close_timeout"] == 5
    assert kw["max_queue"] == 1024


def test_reconnect_backoff_sequence_exponential_capped(fake_ws, monkeypatch):
    """S2 through the reader: repeated connect failures sleep the
    exponential-capped-jittered sequence min(30, 0.25*2^n)*[0.8,1.2]
    (reference okx_ws.py:96-103)."""
    connect, _ = fake_ws
    failures = [OSError("refused")] * 9
    orig = connect

    def flaky(url, **kwargs):
        if failures:
            raise failures.pop(0)
        return orig(url, **kwargs)

    client = sys.modules["websockets.sync.client"]
    monkeypatch.setattr(client, "connect", flaky)
    connect.frames_per_socket = [["x"]]
    slept = []
    monkeypatch.setattr("time.sleep", slept.append)
    rows, _ = make_reader().read({"frame": 0})
    assert [r[0] for r in rows] == ["x"]
    assert len(slept) == 9
    for n, d in enumerate(slept):
        nominal = min(30.0, 0.25 * (2**n))
        assert nominal * 0.8 <= d <= nominal * 1.2
    # the cap binds from attempt 7 on (0.25*2^7 = 32 > 30)
    assert slept[8] <= 30.0 * 1.2


def test_backoff_restarts_at_base_after_successful_connect(fake_ws, monkeypatch):
    """After a successful (re)connect the attempt counter is back at
    zero: the next outage's first delay is in the base band again, not
    a continuation of the previous exponential run."""
    connect, sockets = fake_ws
    fail_then_ok = [OSError("a"), OSError("b"), OSError("c"), None, OSError("d"), None]
    orig = connect

    def flaky(url, **kwargs):
        step = fail_then_ok.pop(0)
        if step is not None:
            raise step
        return orig(url, **kwargs)

    client = sys.modules["websockets.sync.client"]
    monkeypatch.setattr(client, "connect", flaky)
    # socket 1 dies mid-read -> reconnect (one failure, then socket 2)
    connect.frames_per_socket = [["f1", OSError("gone")], ["f2"]]
    slept = []
    monkeypatch.setattr("time.sleep", slept.append)
    rows, _ = make_reader().read({"frame": 0})
    assert [r[0] for r in rows] == ["f1", "f2"]
    assert len(sockets) == 2
    # first outage: 3 sleeps at attempts 0,1,2; second outage: 1 sleep
    # back at attempt 0 (NOT attempt 3's 2.0s band)
    assert len(slept) == 4
    assert slept[3] <= 0.25 * 1.2
    assert slept[2] >= 1.0 * 0.8
