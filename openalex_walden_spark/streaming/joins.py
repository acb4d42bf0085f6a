"""Stream-stream joins (SURVEY.md §2.9 extension).

The reference's pipelines join streams only indirectly (stage chaining
through tables); Structured Streaming's native stream-stream interval
join is the direct form, and it is the streaming counterpart of the
batch bucket-blocked range join (``queries/timeseries.py:j15_range_join``)
— same half-open containment semantics, but with watermarks bounding the
join state on both sides, which is what makes it runnable forever on an
unbounded 100-TB/day event stream: each side buffers only rows younger
than its watermark, and the time-range condition lets Spark expire state
deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_ts: str,
    build_ts: str,
    window: str,
    watermark: str,
) -> DataFrame:
    """Inner-join two streams on ``key`` where the probe row's timestamp
    falls in the half-open window [build_ts, build_ts + window).

    Both sides carry the SAME watermark delay so neither can stall the
    other's state eviction; the join condition includes the time range,
    which Structured Streaming requires to bound buffered state."""
    p = probe.withWatermark(probe_ts, watermark).alias("p")
    b = build.withWatermark(build_ts, watermark).alias("b")
    cond = (
        (F.col(f"p.{key}") == F.col(f"b.{key}"))
        & (F.col(f"b.{build_ts}") <= F.col(f"p.{probe_ts}"))
        & (F.col(f"p.{probe_ts}") < F.expr(f"b.{build_ts} + interval {window}"))
    )
    return p.join(b, cond, "inner")
