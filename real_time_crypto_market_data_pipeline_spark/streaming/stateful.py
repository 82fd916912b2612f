"""Stateful streaming operators (SURVEY 2.3 A6 in streaming form).

The reference keeps a ``dict[(symbol, channel) -> last_ts]`` and emits
``stale_ms = ts - last_ts`` per event (rolling.py:35,85-94). In
Structured Streaming that dict IS keyed state:
``applyInPandasWithState`` with one LONG of state per key.

Scale notes: state is 8 bytes per (symbol, channel) - thousands of
keys, trivially small. The grouped shuffle is the same hash exchange
the batch lag uses; state-store checkpointing gives restart-safety the
reference lacks. Negative staleness on reordered frames passes through
unclamped, matching rolling.py:88.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STALE_OUTPUT_DDL = (
    "symbol STRING, channel STRING, ts_exchange_ms LONG, stale_ms LONG"
)
_STATE_DDL = "last_ts LONG"


def _stale_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (symbol, channel) = key
    last_ts = state.get[0] if state.exists else None
    out_ts: list[int] = []
    out_stale: list[int] = []
    for pdf in pdfs:
        # arrival order within the batch: the source's receive stamp,
        # mirroring the reference's event-loop ordering (app.py:89-98)
        pdf = pdf.sort_values(["ts_recv_epoch_ms", "ts_exchange_ms"], kind="stable")
        for ts in pdf["ts_exchange_ms"]:
            ts = int(ts)
            if last_ts is not None:
                out_ts.append(ts)
                out_stale.append(ts - last_ts)  # may be negative; no clamp
            last_ts = ts
    state.update((last_ts,))
    if out_ts:
        yield pd.DataFrame(
            {
                "symbol": symbol,
                "channel": channel,
                "ts_exchange_ms": out_ts,
                "stale_ms": out_stale,
            }
        )


def streaming_staleness(events: DataFrame) -> DataFrame:
    """A6 (streaming): per-(symbol, channel) consecutive-diff staleness.

    First event per key emits nothing (rolling.py:87); state survives
    across microbatches and restarts via the checkpointed state store.
    """
    cols = ["symbol", "channel", "ts_exchange_ms", "ts_recv_epoch_ms"]
    return (
        events.select(*cols)
        .groupBy("symbol", "channel")
        .applyInPandasWithState(
            _stale_fn,
            outputStructType=STALE_OUTPUT_DDL,
            stateStructType=_STATE_DDL,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
