"""Stream–stream stateful joins (north_rule: "stateful join").

Two forms, both pure Structured Streaming state machines (no Python in the
hot path — the join state is JVM-side, keyed and watermark-evicted):

1. ``windowed_stream_join``: both sides are bucketed into the same tumbling
   event-time window and joined on (window, keys) equality. Spark
   co-partitions the join state by the equality keys and evicts a window's
   buffered rows once BOTH watermarks pass its end — state is bounded by
   one window of data per side. This is the engine's "relations/side
   stream joined to the member stream per bucket" shape (SURVEY.md §2.3):
   bucket_id of a time bucketizer IS the window start.

2. ``interval_bucket_join``: equality on an arbitrary bucket key plus an
   event-time range predicate (right within ``max_delay`` of left). Spark
   derives state eviction from the range condition + watermarks. Use when
   the two streams share a key but not a common window grid.

Scale notes: join state is hash-partitioned on the equality keys — the
same skew story as any keyed state (salt hot buckets upstream if one
bucket dominates). Watermark delay directly sizes the state store; at
10^12-row scale keep it as tight as ingest jitter allows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_stream_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_time: str,
    right_time: str,
    duration: str,
    left_watermark: str,
    right_watermark: str,
    keys: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join two streams on equal tumbling windows (+ optional keys).

    Returns the joined stream with the shared window exposed as
    ``bucket_ts`` (window start) — the time-bucketizer's bucket identity.
    """
    lw = (
        left.withWatermark(left_time, left_watermark)
        .withColumn("_wl", F.window(F.col(left_time), duration))
    )
    rw = (
        right.withWatermark(right_time, right_watermark)
        .withColumn("_wr", F.window(F.col(right_time), duration))
    )
    cond = lw["_wl"] == rw["_wr"]
    for k in keys or []:
        cond = cond & (lw[k] == rw[k])
    joined = lw.join(rw, cond, how)
    for k in keys or []:
        joined = joined.drop(rw[k])  # keep one copy of each equality key
    return joined.withColumn("bucket_ts", lw["_wl"]["start"]).drop("_wl", "_wr")


def interval_bucket_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_time: str,
    right_time: str,
    left_watermark: str,
    right_watermark: str,
    max_delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Equality join on ``key`` with an event-time range condition:
    right_time ∈ [left_time - max_delay, left_time + max_delay]."""
    lw = left.withWatermark(left_time, left_watermark)
    rw = right.withWatermark(right_time, right_watermark)
    delay = F.expr(f"INTERVAL {max_delay}")
    cond = (
        (lw[key] == rw[key])
        & (rw[right_time] >= lw[left_time] - delay)
        & (rw[right_time] <= lw[left_time] + delay)
    )
    return lw.join(rw, cond, how)
