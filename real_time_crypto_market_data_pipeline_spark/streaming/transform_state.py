"""Arbitrary-state streaming via transformWithStateInPandas (Spark 4).

Two operators the reference's rolling dict (rolling.py:35,85-116)
cannot express but a stateful engine should:

- ``streaming_quote_ewma``: per-symbol EWMA of mid price and spread
  with a bounded rolling tail, flagging spread blowouts online. The
  reference recomputes rolling stats over a deque each tick; EWMA
  state is O(1) per key and restart-safe.
- ``streaming_idle_flush``: event-time timers that close out a symbol
  after a quiet gap and emit a session summary - the "symbol went
  quiet" signal the reference can only infer offline.

Both REQUIRE the RocksDB state store (transformWithState is only
implemented there). ``rocksdb_conf()`` returns the needed settings;
tests set them on the session before starting the query.

Runtime requirement: the transformWithState state protocol speaks
protobuf (pyspark/sql/streaming/proto/StateMessage_pb2) - in
environments without ``google.protobuf`` these operators cannot
execute, and their tests skip. ``stateful.py`` carries the SAME two
operators on applyInPandasWithState (GroupState + EventTimeTimeout),
which has no protobuf dependency and is fully tested here; this
module is the forward path once the cluster image ships protobuf.

Scale notes: state per key is a handful of doubles (EWMA) or one
(count, last_ts) pair plus one timer (idle) - millions of symbols fit
in a single executor's RocksDB. The grouped shuffle partitions by
symbol exactly like the batch metrics path, and changelog
checkpointing keeps commit cost proportional to the batch's touched
keys, not total state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def rocksdb_conf() -> dict[str, str]:
    """Session confs required by transformWithState operators."""
    return {
        "spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER,
        # commit only keys touched this batch, not the full store
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
    }


EWMA_OUTPUT_DDL = (
    "symbol STRING, ts_exchange_ms LONG, mid DOUBLE, spread DOUBLE, "
    "ewma_mid DOUBLE, ewma_spread DOUBLE, rolling_mid DOUBLE, "
    "n LONG, spread_blowout BOOLEAN"
)


class QuoteEwmaProcessor(StatefulProcessor):
    """Per-symbol online EWMA + bounded rolling tail + anomaly flag.

    ValueState holds (ewma_mid, ewma_spread, n); ListState holds the
    last ``window`` mids (the reference's deque, rolling.py:35, but
    keyed, bounded, and checkpointed). A spread more than ``k`` times
    the prevailing EWMA spread after warmup is flagged.
    """

    def __init__(self, alpha: float = 0.2, window: int = 5, k: float = 3.0,
                 warmup: int = 5):
        self._alpha = alpha
        self._window = window
        self._k = k
        self._warmup = warmup

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._ewma = handle.getValueState(
            "ewma", "ewma_mid DOUBLE, ewma_spread DOUBLE, n LONG"
        )
        self._recent = handle.getListState("recent", "mid DOUBLE")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (symbol,) = key
        if self._ewma.exists():
            ewma_mid, ewma_spread, n = self._ewma.get()
        else:
            ewma_mid, ewma_spread, n = 0.0, 0.0, 0
        tail = [r[0] for r in self._recent.get()] if self._recent.exists() else []
        a = self._alpha
        out: dict[str, list] = {c: [] for c in (
            "ts", "mid", "spread", "ewma_mid", "ewma_spread", "rolling_mid",
            "n", "blowout")}
        for pdf in rows:
            pdf = pdf.sort_values("ts_exchange_ms", kind="stable")
            for ts, bid, ask in zip(
                pdf["ts_exchange_ms"], pdf["best_bid"], pdf["best_ask"]
            ):
                mid = (bid + ask) / 2.0
                spread = ask - bid
                blowout = bool(
                    n >= self._warmup
                    and ewma_spread > 0
                    and spread > self._k * ewma_spread
                )
                if n == 0:
                    ewma_mid, ewma_spread = mid, spread
                else:
                    ewma_mid = a * mid + (1 - a) * ewma_mid
                    ewma_spread = a * spread + (1 - a) * ewma_spread
                n += 1
                tail.append(mid)
                if len(tail) > self._window:
                    tail = tail[-self._window:]
                out["ts"].append(int(ts))
                out["mid"].append(mid)
                out["spread"].append(spread)
                out["ewma_mid"].append(ewma_mid)
                out["ewma_spread"].append(ewma_spread)
                out["rolling_mid"].append(sum(tail) / len(tail))
                out["n"].append(n)
                out["blowout"].append(blowout)
        self._ewma.update((ewma_mid, ewma_spread, n))
        self._recent.clear()
        if tail:
            self._recent.put([(m,) for m in tail])
        if out["ts"]:
            yield pd.DataFrame(
                {
                    "symbol": symbol,
                    "ts_exchange_ms": out["ts"],
                    "mid": out["mid"],
                    "spread": out["spread"],
                    "ewma_mid": out["ewma_mid"],
                    "ewma_spread": out["ewma_spread"],
                    "rolling_mid": out["rolling_mid"],
                    "n": out["n"],
                    "spread_blowout": out["blowout"],
                }
            )

    def close(self) -> None:
        pass


def streaming_quote_ewma(
    books: DataFrame, alpha: float = 0.2, window: int = 5, k: float = 3.0
) -> DataFrame:
    """EWMA mid/spread tracker over normalized book events.

    Input needs (symbol, ts_exchange_ms, best_bid, best_ask) - i.e.
    ``normalized_stream(...)`` book rows with the struct fields projected out.
    """
    from pyspark.sql import functions as F

    if "best_bid" not in books.columns:
        books = books.where(F.col("book").isNotNull()).withColumns(
            {
                "best_bid": F.col("book.best_bid"),
                "best_ask": F.col("book.best_ask"),
            }
        )
    events = books.select("symbol", "ts_exchange_ms", "best_bid", "best_ask")
    return events.groupBy("symbol").transformWithStateInPandas(
        statefulProcessor=QuoteEwmaProcessor(alpha=alpha, window=window, k=k),
        outputStructType=EWMA_OUTPUT_DDL,
        outputMode="append",
        timeMode="None",
    )


IDLE_OUTPUT_DDL = (
    "symbol STRING, n_events LONG, first_ms LONG, last_ms LONG, "
    "flushed_at_ms LONG"
)


class IdleSymbolFlushProcessor(StatefulProcessor):
    """Close out a symbol after ``gap_ms`` of event-time silence.

    Each batch re-registers one event-time timer at last_event+gap
    (deleting the previous): when the watermark passes it, the expired
    -timer path emits the session summary and clears state - the
    stateful analogue of session_window, but with full control over
    the emitted payload and state lifecycle.
    """

    def __init__(self, gap_ms: int = 5_000):
        self._gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._agg = handle.getValueState("agg", "n LONG, first_ms LONG, last_ms LONG")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        if self._agg.exists():
            n, first_ms, last_ms = self._agg.get()
        else:
            n, first_ms, last_ms = 0, None, None
        for pdf in rows:
            ts = pdf["ts_exchange_ms"]
            n += len(ts)
            lo, hi = int(ts.min()), int(ts.max())
            first_ms = lo if first_ms is None else min(first_ms, lo)
            last_ms = hi if last_ms is None else max(last_ms, hi)
        self._agg.update((n, first_ms, last_ms))
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        self._handle.registerTimer(last_ms + self._gap_ms)
        return iter(())

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        (symbol,) = key
        if self._agg.exists():
            n, first_ms, last_ms = self._agg.get()
            self._agg.clear()
            yield pd.DataFrame(
                {
                    "symbol": [symbol],
                    "n_events": [n],
                    "first_ms": [first_ms],
                    "last_ms": [last_ms],
                    "flushed_at_ms": [expiredTimerInfo.getExpiryTimeInMs()],
                }
            )

    def close(self) -> None:
        pass


def streaming_idle_flush(
    events: DataFrame, gap_ms: int = 5_000, watermark: str = "2 seconds"
) -> DataFrame:
    """Per-symbol idle-gap session flush driven by event-time timers.

    Input needs (symbol, ts_exchange_ms). The watermark drives timer
    expiry; output rows appear only once a symbol has been silent for
    ``gap_ms`` of event time.
    """
    from pyspark.sql import functions as F

    keyed = events.select(
        "symbol",
        "ts_exchange_ms",
        F.timestamp_millis(F.col("ts_exchange_ms")).alias("event_time"),
    ).withWatermark("event_time", watermark)
    return keyed.groupBy("symbol").transformWithStateInPandas(
        statefulProcessor=IdleSymbolFlushProcessor(gap_ms=gap_ms),
        outputStructType=IDLE_OUTPUT_DDL,
        outputMode="append",
        timeMode="EventTime",
        eventTimeColumnName="",
    )
