"""Streaming multimodal featurization — the media family's streaming
mirror, completing the per-family coverage (dedup, decontamination,
segment counting, packing, tries, subject, geo, time, ANN, and now
media all have one).

A media row is atomic: its features depend on nothing but its own
payload, so the stage is stateless and append-pure (decon_stream's
shape — no keyed state, no watermark). ``mapInPandas`` is
streaming-native, and foreachBatch runs the EXACT batch operators
(``resize_image`` → ``image_features`` from functions/multimodal), so
batch/stream drift is impossible by construction; kill/resume
correctness rides on source offsets + the manifest-gated
``IdempotentParquetSink`` (replayed micro-batches are skipped, not
re-featurized).

Scale shape per micro-batch: payload bytes stay in the executor JVM
until the Arrow transfer of exactly (media_id, payload); with an
upstream resize the rows that reach the sink (and any later shuffle)
carry ~3·out_w·out_h bytes regardless of input size. Batch memory is
bounded by spark.sql.execution.arrow.maxRecordsPerBatch — size it to
the payload scale (see functions/multimodal's 100 TB notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from bucketizers_spark.functions.multimodal import (
    image_features,
    resize_image,
)
from bucketizers_spark.sinks.idempotent import IdempotentParquetSink


def run_media_stream(
    media_stream: DataFrame,
    sink_root: str,
    checkpoint: str,
    *,
    resize_to: tuple[int, int] | None = None,
    fake: bool = False,
) -> IdempotentParquetSink:
    """Featurize streaming media rows — optional (out_w, out_h) box
    resize, then image feature extraction — committing
    (media_id, width, height, n_channels, mean_luma, phash) rows
    idempotently per micro-batch. Blocks until all available input is
    processed."""
    sink = IdempotentParquetSink(sink_root)

    def transform(batch_df: DataFrame) -> DataFrame:
        frame = batch_df
        if resize_to is not None:
            out_w, out_h = resize_to
            frame = resize_image(frame, out_w=out_w, out_h=out_h, fake=fake)
            # a resized frame is a REAL P6 payload, so featurization of
            # the resized output never needs the fake path
            return image_features(frame, fake=False)
        return image_features(frame, fake=fake)

    q = (
        media_stream.writeStream.foreachBatch(sink.foreach_batch(transform))
        .option("checkpointLocation", checkpoint)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return sink
