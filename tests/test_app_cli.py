"""CLI surface tests (P1): arg validation parity with the reference
(app.py:150-196,203-211) and an end-to-end replay run through main()."""

from __future__ import annotations

import json
import os

import pytest

from real_time_crypto_market_data_pipeline_spark.app import main, parse_args, split_csv_arg


def test_defaults():
    a = parse_args(["--replay-path", "x"])
    assert a.symbol_list == ["BTC-USDT", "ETH-USDT"]
    assert a.channel_list == ["books5"]
    assert a.csv_export_interval == 30.0


def test_csv_split_strips_and_drops_empties():
    assert split_csv_arg(" a , ,b,", "--symbols") == ["a", "b"]


def test_empty_symbols_rejected():
    with pytest.raises(SystemExit):
        parse_args(["--symbols", " , ", "--replay-path", "x"])


def test_replay_requires_path():
    with pytest.raises(SystemExit):
        parse_args(["--mode", "replay"])


def test_main_replay_end_to_end(tmp_path):
    frames = [
        '{"arg": {"channel": "books5", "instId": "BTC-USDT"},'
        ' "data": [{"ts": "1000", "bids": [["10", "1", "0", "1"]], "asks": [["11", "1", "0", "1"]]}]}',
        '{"arg": {"channel": "books5", "instId": "BTC-USDT"},'
        ' "data": [{"ts": "2000", "bids": [["10", "2", "0", "1"]], "asks": [["11", "2", "0", "1"]]}]}',
    ]
    replay = tmp_path / "frames.jsonl"
    replay.write_text("\n".join(frames) + "\n")
    out = tmp_path / "out"
    csv_dir = tmp_path / "metrics"
    rc = main(
        [
            "--mode", "replay",
            "--replay-path", str(replay),
            "--out-dir", str(out),
            "--csv-export", str(csv_dir),
            "--no-stdout",
        ]
    )
    assert rc == 0
    written = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(out / "events")
        for f in fs
        if f.endswith(".txt")
    ]
    assert written
    rec = json.loads(open(written[0]).readline())
    assert rec["symbol"] == "BTC-USDT"
    assert any(f.endswith(".csv") for _r, _d, fs in os.walk(csv_dir) for f in fs)
