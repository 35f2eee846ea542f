"""Streaming training-data ingest — the streaming form of
llm_pipeline's front half: quality gate → cross-batch exact dedup →
per-source incremental packing.

Structured Streaming does not allow two arbitrary keyed-state
operators in one query (dedup keys on the text hash, packing keys on
the source), so the ingest is the repo's STAGED two-job composition
(streaming/compose.py's pattern): job 1 gates + dedups into a staged
parquet directory (file-sink manifest ⇒ exactly-once), job 2
file-streams the staged rows through pack_stream. Each job owns its
checkpoint; kill/resume at any point neither drops nor repacks rows.

Stage semantics, each pinned equal to its batch counterpart in pytest:
- GATE (stateless narrow map): q_corpus_filter's per-document terms —
  word count ≥ min_words, stop-word ratio ≤ 0.5, declared == guessed
  language. The one corpus-GLOBAL filter term (md5-canon exact dedup)
  is exactly what the cross-batch keyed dedup replaces.
- DEDUP (keyed state on md5(text)): first arrival in (seq, doc_id)
  order wins (exact_dedup_stream); duplicates are dropped before
  staging so the packer never sees them. Ordering note vs batch:
  this composition dedups AMONG GATE SURVIVORS, while
  q_corpus_filter's canon term is computed over the whole corpus —
  the two differ only when copies of the same text carry different
  DECLARED metadata (text-derived gate terms are identical across
  copies by construction) and the lowest-id copy's metadata fails the
  gate: batch then drops all copies, the stream keeps the first
  surviving one. The streaming choice is deliberate (content whose
  first copy had bad metadata is still content); the pytest pins the
  stream against a batch replay with the same gate-then-dedup order.
- PACK (keyed state on source): pack_stream's one-long-per-source
  running offset; manifest rows stream out append-only.

Scale shape: gate is pure JVM codegen; each stateful stage shuffles
once per micro-batch on its own key; the staged directory is the only
materialization between them — the same hand-off an Iceberg table
provides in production, with file-listing cost amortized by the
source's maxFilesPerTrigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ingest_gate(
    stream_df: DataFrame, *, min_words: int = 5, rules: str = "gate"
) -> DataFrame:
    """The stateless per-document quality gate (q_corpus_filter minus
    its corpus-global dedup term, which the keyed dedup stage owns).
    ``rules`` selects the same families as the batch pipeline
    (llm_pipeline.prepare_training_data): "gate" (length/stop-ratio/
    language agreement) or "gopher" (the Gopher word-level rule set) —
    both read the ONE shared definition in functions/quality.py, so
    batch and streaming verdicts are identical by construction."""
    from bucketizers_spark.functions.quality import (
        gate_predicate,
        gopher_metrics_col,
    )

    if rules == "gate":
        pred = gate_predicate(
            F.col("text"), F.col("lang"), min_words=min_words
        )
    elif rules == "gopher":
        pred = gopher_metrics_col(F.col("text"))["keep"]
    else:
        raise ValueError(f"unknown quality rules {rules!r}")
    return stream_df.where(pred)


_STAGED_SCHEMA = "seq long, doc_id string, text string, source string"


def run_llm_ingest(
    spark: SparkSession,
    source_stream: DataFrame,
    workdir: str,
    *,
    chunk_len: int = 1024,
    min_words: int = 5,
) -> str:
    """Run both ingest jobs over all currently-available input and
    return the manifest output directory. Re-invoking after more input
    arrives resumes both stages from their checkpoints."""
    import os

    from bucketizers_spark.streaming.dedup_stream import exact_dedup_stream
    from bucketizers_spark.streaming.pack_stream import pack_stream

    staged = os.path.join(workdir, "staged")
    manifest = os.path.join(workdir, "manifest")
    os.makedirs(staged, exist_ok=True)  # stage-2 source may list first

    gated = ingest_gate(source_stream, min_words=min_words)
    deduped = (
        exact_dedup_stream(gated)
        .where(~F.col("is_dup"))
        .select("seq", "doc_id", "text", "source")
    )
    q1 = (
        deduped.writeStream.format("parquet")
        .option("path", staged)
        .option("checkpointLocation", os.path.join(workdir, "ckpt_stage"))
        .outputMode("append")
        .start()
    )
    q1.processAllAvailable()
    q1.stop()

    # No maxFilesPerTrigger here, deliberately: stage-1's sink writes
    # one part-file per shuffle partition per micro-batch, and the
    # file-stream source orders files by MODIFICATION TIME — consuming
    # them one per trigger would feed the packer in partition-listing
    # order, not document order. Taking every newly staged file in one
    # trigger lets pack_stream's (seq, doc_id) sort restore the global
    # arrival order within the trigger; across separate ingest RUNS
    # ordering is ingestion order, the incremental contract.
    staged_stream = (
        spark.readStream.schema(_STAGED_SCHEMA)
        .option("latestFirst", "false")
        .parquet(staged)
    )
    packed = pack_stream(staged_stream, chunk_len=chunk_len)
    q2 = (
        packed.writeStream.format("parquet")
        .option("path", manifest)
        .option("checkpointLocation", os.path.join(workdir, "ckpt_pack"))
        .outputMode("append")
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    return manifest
