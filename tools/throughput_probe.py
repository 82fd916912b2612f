"""Measure decode+normalize throughput on synthetic OKX frames.

Compares against the reference's single-node per-event cost
(BASELINE.md: decode ~10-17 us + normalize ~15-26 us per event on one
thread ~= 40-65k msg/s ceiling). Frames are built JVM-side with
format_string so frame generation does not pollute the measurement;
the input is cached and counted before timing.

Usage: python tools/throughput_probe.py [n_frames]
       python tools/throughput_probe.py --stateful [n_frames]

--stateful measures the keyed-state EWMA path instead: replay-source
book frames through decode -> normalize -> applyInPandasWithState
(streaming/stateful.streaming_quote_ewma) in one microbatch, noop
sink. This is the Python-per-row slow path; the number bounds what a
custom stateful operator costs versus the pure-JVM normalize plan.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from real_time_crypto_market_data_pipeline_spark.operators import normalize as N  # noqa: E402
from real_time_crypto_market_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("throughput")
    base = spark.range(n).repartition(32)
    book = F.format_string(
        '{"arg": {"channel": "books5", "instId": "%s"}, "data": [{"ts": "%d",'
        ' "bids": [["%d.50", "0.5", "0", "3"], ["%d.40", "1.0", "0", "5"]],'
        ' "asks": [["%d.60", "0.2", "0", "2"], ["%d.70", "0.8", "0", "4"]]}]}',
        F.when(F.col("id") % 2 == 0, "BTC-USDT").otherwise("ETH-USDT"),
        F.lit(1735689600000) + F.col("id"),
        F.col("id") % 90000 + 10000,
        F.col("id") % 90000 + 9999,
        F.col("id") % 90000 + 10001,
        F.col("id") % 90000 + 10002,
    )
    trade = F.format_string(
        '{"arg": {"channel": "trades", "instId": "%s"}, "data": [{"ts": "%d",'
        ' "px": "%d.25", "sz": "0.1", "side": "buy", "tradeId": "%d"},'
        ' {"ts": "%d", "px": "%d.26", "sz": "0.2", "side": "sell", "tradeId": "%d"}]}',
        F.when(F.col("id") % 2 == 0, "BTC-USDT").otherwise("ETH-USDT"),
        F.lit(1735689600000) + F.col("id"),
        F.col("id") % 90000 + 10000,
        F.col("id"),
        F.lit(1735689600001) + F.col("id"),
        F.col("id") % 90000 + 10000,
        F.col("id") + n,
    )
    raw = base.select(
        F.when(F.col("id") % 3 == 0, trade).otherwise(book).alias("raw"),
        (F.lit(1735689600100) + F.col("id")).alias("ts_recv_epoch_ms"),
        (F.lit(1_000_000_000) + F.col("id") * 1000).alias("ts_recv_mono_ns"),
        (F.lit(1_000_012_345) + F.col("id") * 1000).alias("ts_decoded_mono_ns"),
    ).cache()
    n_raw = raw.count()
    events = N.normalize_frames(raw)
    events.write.mode("overwrite").format("noop").save()  # warm
    best = min(
        _timed(lambda: events.write.mode("overwrite").format("noop").save())
        for _ in range(3)
    )
    print(
        f"frames={n_raw:,} events={events.count():,} best={best:.2f}s "
        f"frames_per_sec={n_raw / best:,.0f} per_frame_us={best / n_raw * 1e6:.2f}"
    )
    spark.stop()


def main_stateful() -> None:
    import os
    import tempfile

    from real_time_crypto_market_data_pipeline_spark.streaming import pipeline as P
    from real_time_crypto_market_data_pipeline_spark.streaming.stateful import (
        streaming_quote_ewma,
    )

    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = get_spark("throughput-stateful")
    syms = [f"SYM{i}-USDT" for i in range(8)]
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "frames.jsonl")
        with open(path, "w", encoding="utf-8") as f:
            for i in range(n):
                f.write(
                    '{"arg": {"channel": "books5", "instId": "%s"},'
                    ' "data": [{"ts": "%d", "bids": [["%d.50", "1", "0", "1"]],'
                    ' "asks": [["%d.60", "1", "0", "1"]]}]}\n'
                    % (syms[i % 8], 1735689600000 + i, 10000 + i % 90000,
                       10001 + i % 90000)
                )
        def run(df, ckpt):
            q = (
                df.writeStream.outputMode("append")
                .format("noop")
                .option("checkpointLocation", os.path.join(tmp, ckpt))
                .start()
            )
            t0 = time.perf_counter()
            q.processAllAvailable()
            dt = time.perf_counter() - t0
            q.stop()
            return dt

        raw = P.read_raw_stream(spark, mode="replay", path=path, batch_size=n)
        base_dt = run(P.normalized_stream(raw), "ckpt_base")
        raw2 = P.read_raw_stream(spark, mode="replay", path=path, batch_size=n)
        full_dt = run(streaming_quote_ewma(P.normalized_stream(raw2)), "ckpt_full")
    state_dt = max(full_dt - base_dt, 1e-9)
    print(
        f"stateful frames={n:,} keys=8 source+normalize={base_dt:.2f}s "
        f"(dev replay source, Python-side reads) +ewma_state={state_dt:.2f}s "
        f"state_rows_per_sec={n / state_dt:,.0f} state_per_row_us={state_dt / n * 1e6:.2f}"
    )
    spark.stop()


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--stateful":
        main_stateful()
    else:
        main()
