"""Streaming deduplication with bounded state.

The reference's ingest plane dedups repeated repository records as they
arrive (dlt `apply_changes` keeps latest-per-key; the harvest landing
tables additionally drop exact redeliveries).  In Structured Streaming
the bounded-state form of that is ``dropDuplicatesWithinWatermark``:
exact ``dropDuplicates`` on an unbounded stream retains every key ever
seen (state grows without bound — the 100-TB killer), while the
within-watermark variant evicts a key's dedup state once the event-time
watermark passes it, so state is proportional to the watermark window,
not the stream's lifetime.

Contract: duplicates are only *guaranteed* to be dropped when they
arrive within the watermark delay of the first copy — exactly the
redelivery window a file-landing / at-least-once bus produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    event_time_col: str,
    delay: str = "30 minutes",
) -> DataFrame:
    """Bounded-state streaming dedup: first copy of each key (within the
    watermark window) passes through, redeliveries are dropped, and the
    per-key state is evicted once the watermark passes it.

    ``event_time_col`` must be a TIMESTAMP column; ``delay`` is the
    redelivery window to tolerate (and the state-retention bound).
    """
    return stream.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(
        keys
    )
