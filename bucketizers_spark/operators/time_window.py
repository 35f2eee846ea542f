"""Time-window bucketizers — this engine's generalization of the reference's
arrival-order pager (S1) to event time, as required by BASELINE.json
north_rule (tumbling / sliding / session windows, watermark-driven sealing).

The reference has **no** notion of event time — "time" there is arrival
order (BasicBucketizer.ts:47-94; SURVEY.md §2.3 "Time windows: absent").
These operators define the engine semantics:

- tumbling: bucket = the window [t0 + k·dur, t0 + (k+1)·dur) containing
  event_time; exactly one bucket per member.
- sliding: every window of length ``duration`` sliding by ``slide`` that
  contains event_time (duration/slide buckets per member) — the reference's
  multi-bucket membership analog (multi-valued property path → many
  buckets).
- session: per-key windows that merge events closer than ``gap``; window
  end = last event + gap (Spark ``session_window`` semantics).
- relations: consecutive tumbling windows are linked with ``Relation``
  edges exactly like page boundaries (BasicBucketizer.ts:54-60).
- sealing (streaming): a window bucket is immutable once the watermark
  passes its end — the generalization of ``sds:immutable`` (O8); the
  batch forms here seal every window bounded by the max event_time.

Batch forms use native ``F.window`` / ``F.session_window`` (JVM,
whole-stage codegen); the streaming forms in
``bucketizers_spark/streaming`` are the same expressions behind
``readStream`` + ``withWatermark``.

Bucket ids are formatted UTC instants ("yyyy-MM-dd HH:mm:ss" of the window
start) — deterministic and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bucketizers_spark.operators.core import (
    BucketizeResult,
    empty_relations,
    empty_seals,
    relation_row,
)

_FMT = "yyyy-MM-dd HH:mm:ss"


def _bucket_id(window_col) -> F.Column:
    return F.date_format(window_col["start"], _FMT)


def tumbling_bucketizer(
    df: DataFrame,
    time_col: str,
    duration: str,
    *,
    seal: bool = True,
) -> BucketizeResult:
    spark = df.sparkSession
    win = F.window(F.col(time_col), duration)
    assignments = df.withColumn("_w", win).withColumn(
        "bucket_id", _bucket_id(F.col("_w"))
    )
    # boundary relations between consecutive *non-empty* windows, in
    # window order (page p → p+1 analog over event time)
    wins = (
        assignments.groupBy(F.col("_w")).agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("_w")["start"].alias("ws"),
            F.col("_w")["end"].alias("we"),
        )
    )
    nxt = F.lead("ws").over(Window.orderBy("ws"))
    rel_src = wins.withColumn("next_ws", nxt).where(F.col("next_ws").isNotNull())
    relations = rel_src.select(
        *relation_row(
            F.date_format("ws", _FMT),
            "Relation",
            F.date_format("next_ws", _FMT),
        )
    )
    seals_df = (
        wins.select(
            F.date_format("ws", _FMT).alias("bucket_id"),
            F.lit(None).cast("long").alias("sealed_at_seq"),
        )
        if seal
        else empty_seals(spark)
    )
    return BucketizeResult(assignments.drop("_w"), relations, seals_df)


def sliding_bucketizer(
    df: DataFrame,
    time_col: str,
    duration: str,
    slide: str,
) -> BucketizeResult:
    spark = df.sparkSession
    win = F.window(F.col(time_col), duration, slide)
    assignments = df.withColumn("_w", win).withColumn(
        "bucket_id", _bucket_id(F.col("_w"))
    ).drop("_w")
    return BucketizeResult(assignments, empty_relations(spark), empty_seals(spark))


def session_bucketizer(
    df: DataFrame,
    time_col: str,
    gap: str,
    *,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key session windows: returns one row per session with
    (key..., session_start, session_end, n_members). ``session_window``
    merges events closer than ``gap``; end = last event + gap."""
    keys = key_cols or []
    grouped = df.groupBy(
        F.session_window(F.col(time_col), gap).alias("_w"), *keys
    ).agg(F.count(F.lit(1)).alias("n_members"))
    return grouped.select(
        *keys,
        F.date_format(F.col("_w")["start"], _FMT).alias("session_start"),
        F.date_format(F.col("_w")["end"], _FMT).alias("session_end"),
        "n_members",
    )
