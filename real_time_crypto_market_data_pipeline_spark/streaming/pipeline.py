"""Streaming pipeline composition (SURVEY 2.5 P1-P2, 3.1-3.3).

The reference wires source -> normalize -> {metrics, sinks} as three
asyncio tasks in one event loop (app.py:80-109). Here the same
dataflow is one streaming DataFrame lineage fanned out to independent
checkpointed StreamingQueries - the platform supplies the concurrency,
backpressure, and restart semantics the reference hand-rolled.

    raw frames (okx_frames source, replay or live)
      -> normalize_frames (identical Catalyst exprs as batch - the
         batch/streaming unification is the point of Structured
         Streaming: one definition, two physical plans)
      -> [jsonl sink]  [console sink]  [csv snapshot]  [windowed stats]
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.normalize import normalize_frames
from ..sources.okx_ws import register
from . import sinks as K


def read_raw_stream(
    spark: SparkSession,
    mode: str = "replay",
    path: str | None = None,
    batch_size: int = 100,
    symbols: str = "BTC-USDT,ETH-USDT",
    channels: str = "books5",
) -> DataFrame:
    """P1: CLI/config surface -> readStream options (app.py:150-196)."""
    register(spark)
    reader = (
        spark.readStream.format("okx_frames")
        .option("mode", mode)
        .option("batchsize", str(batch_size))
        .option("symbols", symbols)
        .option("channels", channels)
    )
    if path is not None:
        reader = reader.option("path", path)
    return reader.load()


def normalized_stream(raw: DataFrame) -> DataFrame:
    """S5+F1-F9 over the stream - the same operators as batch."""
    return normalize_frames(raw)


def windowed_latency_stats(
    events: DataFrame,
    window: str = "5 seconds",
    slide: str = "1 second",
    watermark: str = "10 seconds",
) -> DataFrame:
    """A1+A5 (streaming): sliding event-time window stats with a
    watermark - the late-data policy the reference lacks (SURVEY 2.6).

    p50/p95/p99 use percentile_approx here: the exact sorted-window
    rule is not incrementally maintainable; the documented streaming
    delta (SURVEY hard-part 3).
    """
    lat = events.select(
        "symbol", "channel",
        F.timestamp_millis(F.col("ts_exchange_ms")).alias("event_time"),
        (F.col("ts_recv_epoch_ms") - F.col("ts_exchange_ms"))
        .cast("double")
        .alias("lat_ms"),
    ).withWatermark("event_time", watermark)
    return lat.groupBy("symbol", "channel", F.window("event_time", window, slide)).agg(
        F.count("lat_ms").alias("lat_count"),
        F.avg("lat_ms").alias("lat_mean"),
        F.coalesce(F.stddev_samp("lat_ms"), F.lit(0.0)).alias("lat_std"),
        F.min("lat_ms").alias("lat_min"),
        F.max("lat_ms").alias("lat_max"),
        F.percentile_approx("lat_ms", 0.5).alias("p50"),
        F.percentile_approx("lat_ms", 0.95).alias("p95"),
        F.percentile_approx("lat_ms", 0.99).alias("p99"),
    )


@dataclass
class PipelineHandles:
    queries: dict[str, StreamingQuery] = field(default_factory=dict)

    def process_all_available(self) -> None:
        for q in self.queries.values():
            q.processAllAvailable()

    def stop(self) -> None:
        K.stop_all(list(self.queries.values()))


def start_pipeline(
    spark: SparkSession,
    replay_path: str,
    work_dir: str,
    enable_console: bool = False,
    enable_jsonl: bool = True,
    enable_csv: bool = True,
) -> PipelineHandles:
    """P2: full dataflow wiring with multi-sink fan-out (app.py:80-109).

    Each sink is an independent checkpointed query over the same
    normalized lineage - K6's per-sink error isolation comes from
    query isolation instead of try/except per write.
    """
    from .observability import observe_decode_health

    raw = observe_decode_health(read_raw_stream(spark, mode="replay", path=replay_path))
    events = normalized_stream(raw)
    handles = PipelineHandles()
    if enable_jsonl:
        handles.queries["jsonl"] = K.start_jsonl_sink(
            events, f"{work_dir}/data", f"{work_dir}/ckpt_jsonl"
        )
    if enable_console:
        handles.queries["console"] = K.start_console_sink(
            events, f"{work_dir}/ckpt_console"
        )
    if enable_csv:
        handles.queries["csv"] = K.start_csv_snapshot_sink(
            events, f"{work_dir}/metrics_csv", f"{work_dir}/ckpt_csv"
        )
    return handles


def streaming_exact_dedup(
    events: DataFrame, watermark: str = "10 seconds"
) -> DataFrame:
    """X1 (streaming): exact dedup within an event-time watermark.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until
    the watermark passes - bounded state for an unbounded stream, the
    scalable form of streaming dedup. Key = (symbol, channel,
    ts_exchange_ms) - the natural identity of a market event.
    """
    keyed = events.withColumn(
        "event_time", F.timestamp_millis(F.col("ts_exchange_ms"))
    ).withWatermark("event_time", watermark)
    return keyed.dropDuplicatesWithinWatermark(["symbol", "channel", "ts_exchange_ms"])


def streaming_near_dedup(
    docs: DataFrame,
    watermark: str = "10 minutes",
    time_col: str = "event_time",
) -> DataFrame:
    """X2 (streaming): ingest-time near-dup suppression, bounded state.

    Keys the watermark dedup on the row-local MinHash signature
    (``dedup.minhash_signature_col`` - computed per row with HOFs, no shuffle,
    so the only stateful operator is the dedup itself): signature-identical
    documents - same shingle SET, i.e. whitespace variants, re-serializations,
    Jaccard ~= 1 rewraps - are dropped inline, with per-signature state held
    only until the watermark passes. Partial-overlap near-dups (banded-LSH
    recall) remain the offline batch pass (``dedup.lsh_candidate_pairs``): the
    standard production split between cheap inline suppression at ingest and
    thorough offline dedup. State key is one 256-char string per unique
    signature in the watermark horizon - at 100 TB/day the horizon, not the
    corpus, bounds memory.
    """
    from ..operators.dedup import minhash_signature_col

    keyed = docs.withColumn(
        "minhash_sig", minhash_signature_col(F.col("text"))
    ).withWatermark(time_col, watermark)
    return keyed.dropDuplicatesWithinWatermark(["minhash_sig"])


def stream_stream_enrich(
    events: DataFrame,
    max_quote_age: str = "10 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Stream-stream interval join: trades enriched with a recent book.

    Splits the normalized stream into its two typed sub-streams and joins
    trade events to book snapshots of the same symbol whose event time lies
    within [trade - max_quote_age, trade]. Watermarks on BOTH sides bound the
    join state: each side only buffers rows until the other side's watermark
    passes the interval - the mechanism that makes stream-stream joins
    feasible on unbounded input (state is O(rate x window), not O(stream)).

    This is the streaming sibling of the batch as-of join (operators/asof.py);
    an interval join can yield multiple quotes per trade (all within the age
    bound) where as-of picks the latest.
    """
    books = (
        events.where(F.col("event_type") == "book_topn")
        .select(
            F.col("symbol").alias("b_symbol"),
            F.timestamp_millis(F.col("ts_exchange_ms")).alias("b_time"),
            F.col("book.best_bid").alias("best_bid"),
            F.col("book.best_ask").alias("best_ask"))
        .withWatermark("b_time", watermark)
    )
    trades = (
        events.where(F.col("event_type") == "trade")
        .select(
            "symbol",
            F.timestamp_millis(F.col("ts_exchange_ms")).alias("t_time"),
            F.col("ts_exchange_ms"), F.col("trade.price").alias("price"),
            F.col("trade.size").alias("size"),
            F.col("trade.side").alias("side"))
        .withWatermark("t_time", watermark)
    )
    return trades.join(
        books,
        F.expr(
            f"""
            symbol = b_symbol AND
            b_time <= t_time AND
            b_time >= t_time - INTERVAL {max_quote_age}
            """
        ),
        "inner",
    ).select(
        "symbol", "ts_exchange_ms", "price", "size", "side",
        "best_bid", "best_ask",
        (F.col("price") - (F.col("best_bid") + F.col("best_ask")) / 2).alias(
            "px_vs_mid"
        ),
    )


def windowed_ohlc(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming OHLC candles per symbol from normalized trade events.

    The streaming twin of q_ohlc_bars: open/close are min_by/max_by on the
    event timestamp inside a tumbling event-time window (incremental
    - the state store keeps one candle-in-progress per (symbol, open window)),
      volume-weighted price included since trades carry size. The watermark
      closes bars and bounds state exactly like the other windowed aggregates.
    """
    trades = events.where(F.col("trade").isNotNull()).select(
        "symbol",
        F.timestamp_millis(F.col("ts_exchange_ms")).alias("event_time"),
        F.col("ts_exchange_ms").alias("ms"),
        F.col("trade.price").alias("price"), F.col("trade.size").alias("size"))
    return (
        trades.withWatermark("event_time", watermark)
        .groupBy("symbol", F.window("event_time", window))
        .agg(
            F.min_by("price", "ms").alias("open"),
            F.max("price").alias("high"),
            F.min("price").alias("low"),
            F.max_by("price", "ms").alias("close"),
            F.sum("size").alias("volume"),
            (F.sum(F.col("price") * F.col("size")) / F.sum("size")).alias("vwap"),
            F.count(F.lit(1)).cast("long").alias("n_trades"),
        )
    )


def streaming_session_stats(
    events: DataFrame,
    gap_ms: int = 86_400_000,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming twin of q_session_stats via native ``session_window``:
    one open session per user in the state store, gap-merge on arrival,
    watermark-driven close - O(open sessions) state, not O(events).

    Gap semantics: ``session_window`` splits when an event lands AT
    last + gap, where the batch lag-rule (``ms - prev > gap``) still
    merges it; a window gap of ``gap_ms + 1`` makes the rules identical,
    so emissions match the batch query bit-for-bit (parity test replays
    sf0.01). Sessions are keyed by (user_id, start_ms): the batch
    ordinal session_id needs total history - the one column a stream
    cannot reproduce; the other four columns match exactly.
    """
    ev = events.select(
        "user_id", F.timestamp_millis(F.col("ms")).alias("event_time"),
        F.col("ms"), F.col("value"))
    return (
        ev.withWatermark("event_time", watermark)
        .groupBy("user_id",
                 F.session_window("event_time", f"{gap_ms + 1} milliseconds"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("ms").cast("long").alias("start_ms"),
            (F.max("ms") - F.min("ms")).cast("long").alias("duration_ms"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("long")
            .alias("value_cents"),
        )
        .drop("session_window")
    )


def enrich_with_static(
    events: DataFrame, dim: DataFrame, on: str = "symbol", how: str = "left"
) -> DataFrame:
    """Stream-static enrichment: join the event stream against a batch
    dimension table (instrument metadata, tick sizes, listing info).

    Stream-static joins are STATELESS - no watermark, no state store:
    Spark re-evaluates the static side every microbatch (so a dim
    refreshed in place is picked up on the next trigger) and the
    explicit broadcast keeps the stream side shuffle-free. This is the
    right shape for slowly-changing reference data; only stream-stream
    joins (stream_stream_enrich) need watermarked state.
    """
    return events.join(F.broadcast(dim), on=on, how=how)


def streaming_temperature_mix(
    doc_stream: DataFrame,
    thresholds: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """X4 (streaming): apply temperature mixing at ingest.

    The census (``text.mix_thresholds``) is computed in batch over the
    existing corpus - a global source distribution is not computable inside an
    unbounded stream - and broadcast into a STATELESS stream-static join; the
    keep/drop decision is then a row-local md5-bucket comparison, so the
    stream side stays shuffle-free and state-free. Because the static side is
    re-evaluated every microbatch, refreshing the materialized census in place
    retunes the mix on the next trigger without restarting the stream. Exact
    same kept-set semantics as the batch operator (``text.temperature_mix``)
    by construction: both halves share the same code.
    """
    from ..operators.text import apply_mix

    return apply_mix(doc_stream, thresholds, source_col=source_col, text_col=text_col)
