"""Operational counters via the observation API (SURVEY archaeology).

The reference's deleted predecessor tracked ``decode_errors``,
``dropped_queue_items``, ``ws_disconnects``, ``ws_reconnects``
(stale bytecode in src/__pycache__, SURVEY.md preamble) - evidence
that operational counters are part of the intended capability surface
even though the live code dropped them.

In Spark these are ``DataFrame.observe`` metrics: arbitrary aggregate
expressions evaluated per microbatch with NO extra pass over the data
(they piggyback on the existing plan), surfaced through
``StreamingQuery.lastProgress['observedMetrics']`` and the listener
bus. Connector-level counters (disconnects/reconnects) live in the
source; the engine-level ones are observed here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.normalize import RAW_FRAME_SCHEMA

OBSERVATION_NAME = "pipeline_counters"


def observe_decode_health(raw: DataFrame, raw_col: str = "raw") -> DataFrame:
    """Attach frame-level counters to the raw stream.

    frames_total / decode_errors (unparsable or non-object JSON) /
    control_frames - the reference's decode_errors counter
    (okx_ws.py:92-94 skip path) as an observed metric.
    """
    parsed = F.from_json(F.col(raw_col), RAW_FRAME_SCHEMA)
    is_decodable = (
        parsed.isNotNull()
        & (
            parsed["event"].isNotNull()
            | parsed["arg"].isNotNull()
            | parsed["data"].isNotNull()
        )
    )
    is_control = F.coalesce(
        parsed["event"].isin("subscribe", "unsubscribe", "error"), F.lit(False)
    )
    return raw.observe(
        OBSERVATION_NAME,
        F.count(F.lit(1)).alias("frames_total"),
        F.sum(F.when(~is_decodable, 1).otherwise(0)).alias("decode_errors"),
        F.sum(F.when(is_decodable & is_control, 1).otherwise(0)).alias(
            "control_frames"
        ),
    )


def last_counters(query) -> dict | None:
    """Read the most recent batch's counters from a StreamingQuery."""
    progress = query.lastProgress
    if not progress:
        return None
    observed = progress.get("observedMetrics", {})
    return observed.get(OBSERVATION_NAME)
