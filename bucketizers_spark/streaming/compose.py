"""Productized multi-stage streaming composition via staged files.

Spark cannot chain two ``applyInPandasWithState`` operators inside one
streaming query (multi-stateful-operator support covers only time-window
ops); the supported pattern — which the reference's inherently-streaming
composition (MultiBucketizer.ts:46-162) maps onto — is stage k writing
its output as files that stage k+1 consumes as a file-stream source.
Spark 4.x ``transformWithStateInPandas`` was probed as a single-query
alternative (tools/tws_probe.py, VERDICT r3 #5) and ruled out twice
over: its Python worker needs google.protobuf, absent from this runtime
(every such query crashes, chained or not), and stateful-after-stateful
chaining is only supported for event-time operators declaring
``eventTimeColumnName`` (SPARK-49070) — these stages are arrival-order
machines with no event time, so the staged-file boundary remains the
correct (and failure-isolating) composition seam.
SURVEY.md §9 documented the pattern; this module packages it as one API
so the caller no longer hand-wires writers, schemas, and checkpoints:

- **Deterministic staged files**: each micro-batch lands as
  ``batch-{id:09d}.parquet`` via write-to-temp + atomic rename. A batch
  replayed after a checkpoint resume finds its file already present and
  skips — the staged stream is exactly-once without a transactional sink
  (the local ``os.replace`` is the sandbox analog of an object-store
  committer; sinks/idempotent.py holds the production MERGE notes).
- **Arrival order**: stage k+1 reads with ``maxFilesPerTrigger`` and
  ``latestFirst=false``; batch-id file names are mod-time monotonic, so
  downstream keyed state sees rows in the same order batch mode sorts
  them (seq within batch, batches in order).
- **Resume safety**: every stage checkpoints under
  ``workdir/stage{k}/ckpt``. Rebuilding the same composition over the
  same workdir resumes each stage from its offsets; the kill/resume
  pytest (tests/test_streaming.py::TestComposeStreams) pins
  streaming == batch across a mid-stream kill.

Scale notes: stages are independent continuously-running queries —
pipeline parallelism across stages, keyed-state parallelism within one.
The per-batch ``coalesce(1)`` bounds file count, not throughput (a
micro-batch is trigger-bounded); raise ``files_per_batch`` if a single
writer task ever bottlenecks a hot stage.
"""

from __future__ import annotations

import glob
import os
import shutil
from typing import Callable, Sequence

import pandas as pd  # module-level: pandas_udf type hints resolve here
from pyspark.sql import DataFrame, SparkSession


def _batch_writer(data_dir: str):
    def write(bdf, batch_id: int) -> None:
        final = os.path.join(data_dir, f"batch-{batch_id:09d}.parquet")
        if os.path.exists(final):
            return  # checkpoint replay after resume — already staged
        tmp = os.path.join(data_dir, f"_tmp-{batch_id}")
        bdf.coalesce(1).write.mode("overwrite").parquet(tmp)
        parts = glob.glob(os.path.join(tmp, "part-*"))
        if parts:
            os.replace(parts[0], final)
        shutil.rmtree(tmp, ignore_errors=True)

    return write


class ComposedStreams:
    """A chain of streaming stages wired through staged files.

    ``stages[k]`` is a transform ``streaming DataFrame -> streaming
    DataFrame`` (e.g. ``subject_page_stream`` / ``paged_stream``
    partials). Stage 0 consumes ``input_stream``; stage k>0 consumes the
    previous stage's staged files. The last stage's staged files are the
    composition's output (``read_output``)."""

    def __init__(
        self,
        input_stream: DataFrame,
        stages: Sequence[Callable[[DataFrame], DataFrame]],
        workdir: str,
        *,
        max_files_per_trigger: int = 1,
        relations: Sequence | None = None,
    ):
        if not stages:
            raise ValueError("at least one stage required")
        if relations is not None and len(relations) != len(stages):
            raise ValueError("relations must align 1:1 with stages")
        self.spark: SparkSession = input_stream.sparkSession
        self.workdir = workdir
        self._queries = []
        self._plans = []
        self._rel_dirs: list[str] = []
        self._rel_readers: list = []
        current = input_stream
        last_data_dir = None
        for k, stage in enumerate(stages):
            data_dir = os.path.join(workdir, f"stage{k}", "data")
            ckpt_dir = os.path.join(workdir, f"stage{k}", "ckpt")
            os.makedirs(data_dir, exist_ok=True)
            if callable(stage):
                # stream→stream transform: run it, stage its micro-batches
                out = stage(current)
                handler = _batch_writer(data_dir)
                schema = out.schema
            else:
                # job stage (JOB_STAGE_PROTOCOL): a foreachBatch job with
                # its own versioned state — the handler runs the job AND
                # stages each committed batch for the next stage
                out = current
                handler = stage.make_handler(data_dir)
                schema = stage.output_schema(current.schema)
                if hasattr(stage, "relations_reader"):
                    self._rel_readers.append(
                        stage.relations_reader(data_dir)
                    )
            self._plans.append((out, handler, ckpt_dir))
            last_data_dir = data_dir
            if k < len(stages) - 1:
                # schema is known before start, so the next stage's file
                # source opens before any file exists
                current = (
                    self.spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", max_files_per_trigger)
                    .option("latestFirst", "false")
                    .parquet(data_dir)
                )
            rel = relations[k] if relations else None
            if hasattr(rel, "make_rel_handler"):
                # JOB REL TEE (GeoRelTee protocol): a foreachBatch
                # consumer of this stage's staged files with its own
                # versioned state — relations land incrementally in
                # rels/, so read_relations() never rescans the stage's
                # complete staged output
                rel_in = (
                    self.spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", max_files_per_trigger)
                    .option("latestFirst", "false")
                    .parquet(data_dir)
                )
                rel_dir = os.path.join(workdir, f"stage{k}", "rels")
                rel_ckpt = os.path.join(workdir, f"stage{k}", "rels_ckpt")
                rel_state = os.path.join(workdir, f"stage{k}", "rels_state")
                os.makedirs(rel_dir, exist_ok=True)
                self._plans.append(
                    (rel_in, rel.make_rel_handler(rel_dir, rel_state), rel_ckpt)
                )
                self._rel_dirs.append(rel_dir)
            elif isinstance(rel, BatchDerivedRelations):
                def _batch_rel_reader(spark, d=data_dir, r=rel):
                    if not glob.glob(os.path.join(d, "*.parquet")):
                        return None
                    return r.derive(
                        spark.read.parquet(os.path.join(d, "*.parquet"))
                    )

                self._rel_readers.append(_batch_rel_reader)
            elif rel is not None:
                # RELATION TEE: a second consumer of this stage's staged
                # files deriving the stage's relation side-output (batch
                # multi's BucketizeResult.relations analog). Reading the
                # staged files (not the live stream) keeps the tee
                # resume-safe and decoupled — it can lag or restart
                # without touching the assignment path.
                rel_in = (
                    self.spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", max_files_per_trigger)
                    .option("latestFirst", "false")
                    .parquet(data_dir)
                )
                rel_dir = os.path.join(workdir, f"stage{k}", "rels")
                rel_ckpt = os.path.join(workdir, f"stage{k}", "rels_ckpt")
                os.makedirs(rel_dir, exist_ok=True)
                self._plans.append(
                    (rel(rel_in), _batch_writer(rel_dir), rel_ckpt)
                )
                self._rel_dirs.append(rel_dir)
        self.output_dir = last_data_dir

    def start(self) -> "ComposedStreams":
        for out, handler, ckpt_dir in self._plans:
            q = (
                out.writeStream.foreachBatch(handler)
                .option("checkpointLocation", ckpt_dir)
                .outputMode("append")
                .start()
            )
            self._queries.append(q)
        return self

    def process_all(self) -> None:
        """Drain every stage in order (test/batch-drain mode). In
        continuous operation just ``start()`` and let all stages run."""
        for q in self._queries:
            q.processAllAvailable()

    def stop(self) -> None:
        for q in self._queries:
            q.stop()
        self._queries = []

    def run_until_drained(self) -> DataFrame:
        self.start()
        self.process_all()
        self.stop()
        return self.read_output()

    def read_output(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.output_dir, "*.parquet"))

    def read_relations(self) -> DataFrame:
        """Union of every relation side-output: tee-staged frames plus
        job-stage sinks (RELATIONS_SCHEMA — the batch multi
        BucketizeResult.relations analog). Raises if the composition has
        no relation sources at all."""
        if not self._rel_dirs and not self._rel_readers:
            raise ValueError(
                "composition has no relation tees — pass "
                "relations=relations_from_spec(spec) to compose_streams"
            )
        parts = []
        for d in self._rel_dirs:
            if glob.glob(os.path.join(d, "*.parquet")):
                parts.append(
                    self.spark.read.parquet(os.path.join(d, "*.parquet"))
                )
        for read in self._rel_readers:
            part = read(self.spark)
            if part is not None:
                parts.append(part)
        if not parts:
            from bucketizers_spark.operators.core import empty_relations

            return empty_relations(self.spark)
        out = parts[0]
        for part in parts[1:]:
            out = out.unionByName(part, allowMissingColumns=True)
        return out


class GeoRelTee:
    """Incremental relation tee for composed geo stages (stage 0 or
    child): consumes the stage's staged flags+leaf rows as a file stream
    and emits the relation rows PER MICRO-BATCH instead of rescanning
    the complete staged output at read time (the r4 BatchDerivedRelations
    form — at 100 TB that read-time scan is a real per-listing cost).

    Streamability: column → leaf-page and fallback links ride the
    ``is_new_page`` flag (append-monotone — a page is new exactly once
    across the stream, the keyed pager guarantees it); the root/parent →
    column row is the only cross-batch fact, deduped with a VERSIONED
    emitted-columns table exactly like the standalone GeoStreamJob
    (geo_stream.py:206-237): state version v=batch_id is written BEFORE
    the relation batch file, so a crash between the two is healed on
    checkpoint replay — the recompute reads versions < batch_id and
    overwrites its own state idempotently. Reference semantics:
    GeospatialBucketizer.ts:153-184 (column → page per new page, root →
    column once with the FIRST tile's bbox)."""

    def __init__(self, c, *, with_parent: bool):
        self.c = c
        self.with_parent = with_parent

    def _parts(self, df):
        """(column_rels, root_candidates, fallback_rels) for one
        micro-batch of staged rows — same naming/bbox/seq construction
        as the r4 read-time staged derive, but driven by the pager flags so each
        part is exact without any cross-batch grouping (root candidates
        still need the anti-join in the handler)."""
        from pyspark.sql import functions as F
        from pyspark.sql.functions import pandas_udf

        from bucketizers_spark.operators.core import relation_row
        from bucketizers_spark.operators.geospatial import tile_bbox_wkt

        root = getattr(self.c, "root", "root") or "root"
        pcols = ["_parent"] if self.with_parent else []

        @pandas_udf("string")
        def bbox_of(leaf: pd.Series) -> pd.Series:
            def one(s: str) -> str:
                zs, xs, ys = s.split("/")
                return tile_bbox_wkt(int(xs), int(ys), int(zs))

            return leaf.map(one)

        matched = df.where(F.col("_leaf") != "bucketless")
        fb = df.where(F.col("_leaf") == "bucketless")
        raw_col = F.regexp_replace(F.col("_leaf"), r"/[^/]+$", "")
        if self.with_parent:
            column = F.concat(F.col("_parent"), F.lit("/"), raw_col)
            page_bucket = F.concat(
                F.col("_parent"), F.lit("/"), F.col("_leaf"),
                F.lit("-"), F.col("_page"),
            )
            fb_from = F.col("_parent")
            fb_to = F.concat(
                F.col("_parent"), F.lit("/bucketless-"), F.col("_page")
            )
            root_from = F.col("_parent")
        else:
            column = raw_col
            page_bucket = F.concat(
                F.col("_leaf"), F.lit("-"), F.col("_page")
            )
            fb_from = F.lit(root)
            fb_to = F.concat(F.lit("bucketless-"), F.col("_page"))
            root_from = F.lit(root)
        new_pages = matched.where(F.col("is_new_page")).withColumn(
            "_bbox", bbox_of(F.col("_leaf"))
        )
        column_rels = new_pages.select(
            *relation_row(
                column,
                "GeospatiallyContains",
                page_bucket,
                values=F.array(F.col("_bbox")),
                seq=F.col("seq"),
            )
        )
        root_cands = (
            matched.where(F.col("is_new_tile"))
            .withColumn("_column", column)
            .groupBy(*pcols, "_column")
            .agg(
                F.min("seq").alias("created_at_seq"),
                # (seq, _tpos): pair order breaks same-member seq ties
                F.min_by(
                    "_leaf", F.struct(F.col("seq"), F.col("_tpos"))
                ).alias("_first_leaf"),
            )
            .withColumn("_bbox", bbox_of(F.col("_first_leaf")))
            .select(
                *relation_row(
                    root_from,
                    "GeospatiallyContains",
                    F.col("_column"),
                    values=F.array(F.col("_bbox")),
                    seq=F.col("created_at_seq"),
                )
            )
        )
        fb_rels = fb.where(F.col("is_new_page")).select(
            *relation_row(
                fb_from, "Relation", fb_to, seq=F.col("seq")
            )
        )
        return column_rels, root_cands, fb_rels

    def _emitted(self, spark, state_dir: str, before_batch: int):
        versions = sorted(
            int(os.path.basename(p).split("=")[1])
            for p in glob.glob(os.path.join(state_dir, "columns", "v=*"))
            if os.path.exists(os.path.join(p, "_SUCCESS"))
        )
        versions = [v for v in versions if v < before_batch]
        if not versions:
            return None
        return spark.read.parquet(
            os.path.join(state_dir, "columns", f"v={versions[-1]}")
        )

    def make_rel_handler(self, rel_dir: str, state_dir: str):
        from pyspark.sql import functions as F

        os.makedirs(os.path.join(state_dir, "columns"), exist_ok=True)

        def handler(bdf, batch_id: int) -> None:
            final = os.path.join(rel_dir, f"batch-{batch_id:09d}.parquet")
            if os.path.exists(final):
                return  # checkpoint replay — already committed
            spark = bdf.sparkSession
            bdf = bdf.persist()
            column_rels, root_cands, fb_rels = self._parts(bdf)
            emitted = self._emitted(spark, state_dir, batch_id)
            if emitted is not None:
                root_rels = root_cands.join(
                    emitted.withColumnRenamed("column", "to_bucket"),
                    "to_bucket",
                    "left_anti",
                )
            else:
                root_rels = root_cands
            out = (
                column_rels.unionByName(root_rels).unionByName(fb_rels)
            ).persist()
            new_cols = root_rels.select(F.col("to_bucket").alias("column"))
            all_cols = (
                new_cols
                if emitted is None
                else emitted.unionByName(new_cols).distinct()
            )
            # state BEFORE the relation file (cf. GeoStreamJob): a crash
            # in between replays as a recompute from versions < batch_id
            all_cols.write.mode("overwrite").parquet(
                os.path.join(state_dir, "columns", f"v={batch_id}")
            )
            tmp = os.path.join(rel_dir, f"_tmp-{batch_id}")
            out.coalesce(1).write.mode("overwrite").parquet(tmp)
            parts = glob.glob(os.path.join(tmp, "part-*"))
            if parts:
                os.replace(parts[0], final)
            shutil.rmtree(tmp, ignore_errors=True)
            out.unpersist()
            bdf.unpersist()

        return handler


class BatchDerivedRelations:
    """A relation side-output that is NOT append-monotone — emitting it
    incrementally would require retractions (e.g. the tumbling child's
    lead-link chain over observed windows: a late window re-links both
    neighbors). Instead of a streaming tee, ``derive`` runs as a batch
    computation over the stage's COMPLETE staged output when
    ``read_relations()`` is called — exact by construction and
    resume-safe (the staged files are the source of truth)."""

    def __init__(self, derive):
        self.derive = derive


class TrieStage:
    """``TrieStreamJob`` as a compose stage (the JOB_STAGE_PROTOCOL: an
    object with ``output_schema`` + ``make_handler`` instead of a
    stream→stream callable). The versioned-counter trie cascade
    (streaming/trie_stream.py) cannot be an applyInPandasWithState
    transform — placement needs cross-key coordination per level — so
    the stage runs the job's foreachBatch handler under the compose
    checkpoint, then stages each committed batch's assignments as the
    atomic batch file the next stage's file source consumes.

    Exactly-once across resume: ``process_batch`` is replay-idempotent
    (sink manifest + versioned counters); the staging step is skipped
    when the batch file already exists, and a crash between sink commit
    and staging is healed on replay by re-staging from the sink."""

    # stage-0 artifact columns a child stage replaces with its own
    _CHILD_DROPS = ("_parent", "_wstart", "is_first")

    def __init__(
        self,
        *,
        mode: str = "token",
        value_col: str = "tokens",
        page_size: int = 50,
        max_depth: int = 8,
        root: str = "root",
        within_parent: bool = False,
    ):
        self.mode = mode
        self.value_col = value_col
        self.page_size = page_size
        self.max_depth = max_depth
        self.root = root
        # child mode (stage k>0): the incoming bucket_id is the parent;
        # one dedicated trie per parent bucket, node names parent/node,
        # per-(parent, node) versioned counters (_run_cascade parent_col
        # + node_state — the TrieStage cross-key shape VERDICT r3 #1)
        self.within_parent = within_parent

    def _prep_child(self, bdf):
        drops = [c for c in self._CHILD_DROPS if c in bdf.columns]
        return bdf.drop(*drops).withColumnRenamed("bucket_id", "_parent")

    def output_schema(self, input_schema):
        from pyspark.sql import types as T

        if self.within_parent:
            fields = []
            for f in input_schema.fields:
                if f.name in self._CHILD_DROPS:
                    continue
                if f.name == "bucket_id":
                    fields.append(T.StructField("_parent", f.dataType))
                else:
                    fields.append(f)
            return T.StructType(
                fields + [T.StructField("bucket_id", T.StringType())]
            )
        return T.StructType(
            list(input_schema.fields)
            + [T.StructField("bucket_id", T.StringType())]
        )

    def make_handler(self, data_dir: str):
        from bucketizers_spark.streaming.trie_stream import TrieStreamJob

        stage_root = os.path.dirname(data_dir)
        job = TrieStreamJob(
            os.path.join(stage_root, "sink"),
            os.path.join(stage_root, "state"),
            mode=self.mode,
            value_col=self.value_col,
            page_size=self.page_size,
            max_depth=self.max_depth,
            root=self.root,
            parent_col="_parent" if self.within_parent else None,
        )

        def handler(bdf, batch_id: int) -> None:
            if self.within_parent:
                bdf = self._prep_child(bdf)
            job.process_batch(bdf, batch_id)
            final = os.path.join(data_dir, f"batch-{batch_id:09d}.parquet")
            if os.path.exists(final):
                return
            out = bdf.sparkSession.read.parquet(
                os.path.join(job.sink.root, f"batch_id={batch_id}")
            )
            tmp = os.path.join(data_dir, f"_tmp-{batch_id}")
            out.coalesce(1).write.mode("overwrite").parquet(tmp)
            parts = glob.glob(os.path.join(tmp, "part-*"))
            if parts:
                os.replace(parts[0], final)
            shutil.rmtree(tmp, ignore_errors=True)

        return handler

    def relations_reader(self, data_dir: str):
        """Batch reader over the job's committed relations sink, for
        ComposedStreams.read_relations() — the trie's relations are
        produced inside process_batch and land in the job's own
        idempotent sink, so no separate tee query is needed."""
        from bucketizers_spark.sinks.idempotent import IdempotentParquetSink

        stage_root = os.path.dirname(data_dir)
        sink = IdempotentParquetSink(
            os.path.join(stage_root, "sink", "_relations")
        )

        def read(spark):
            try:
                return sink.read_all(spark).drop("batch_id")
            except FileNotFoundError:
                return None

        return read


def _geo_stage(s: DataFrame, c, *, with_parent: bool) -> DataFrame:
    """Geospatial compose stage — stage-0 (standalone tile naming) or
    child (parent-prefixed, per-parent counters). Per-(parent?, tile)
    page counters run in ONE stateful op: non-WKT/pole rows take a
    'bucketless' sentinel leaf through the same keyed pager, which
    reproduces the batch fallback naming (``bucketless-N`` standalone —
    operators/basic.fallback_pager — or ``parent/bucketless-N`` —
    operators/multi.geo_within_parent) without a second stateful
    operator in the query."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    from bucketizers_spark.operators.geospatial import tile_array_col
    from bucketizers_spark.streaming.geo_stream import (
        _PAGER_STATE,
        _make_tile_pager_fn,
    )

    work = s.drop("_parent", "_wstart", "is_first")
    if with_parent:
        work = work.withColumnRenamed("bucket_id", "_parent")
    work = work.withColumn("_tiles", tile_array_col(c.column, c.zoom))
    bad = F.exists(F.col("_tiles"), lambda t: t["y"].isNull())
    # null-safe (see operators/geospatial): NULL values must route
    # to the bucketless sentinel, not vanish in three-valued logic
    matched = F.coalesce((F.size("_tiles") > 0) & ~bad, F.lit(False))
    payload = [col for col in work.columns if col != "_tiles"]
    tiles = (
        work.where(matched)
        .select(*payload, F.posexplode("_tiles").alias("_tpos", "_t"))
        .withColumn(
            "_leaf",
            F.concat_ws(
                "/", F.lit(str(c.zoom)), F.col("_t.x"), F.col("_t.y")
            ),
        )
        .drop("_t")
    )
    fb = (
        work.where(~matched)
        .drop("_tiles")
        .withColumn("_tpos", F.lit(0))
        .withColumn("_leaf", F.lit("bucketless"))
    )
    both = tiles.unionByName(fb)
    out_schema = T.StructType(
        list(both.schema.fields)
        + [
            T.StructField("_page", T.LongType()),
            T.StructField("is_new_tile", T.BooleanType()),
            T.StructField("is_new_page", T.BooleanType()),
        ]
    )
    keys = ["_parent", "_leaf"] if with_parent else ["_leaf"]
    flagged = both.groupBy(*keys).applyInPandasWithState(
        _make_tile_pager_fn(c.page_size, "seq"),
        outputStructType=out_schema,
        stateStructType=_PAGER_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    bucket = F.concat(F.col("_leaf"), F.lit("-"), F.col("_page"))
    if with_parent:
        bucket = F.concat(F.col("_parent"), F.lit("/"), bucket)
    return flagged.withColumn("bucket_id", bucket)


def stages_from_spec(spec) -> list:
    """Map a validated multi JobSpec onto compose_streams stage
    transforms, where per-stage streaming forms exist:

    Stage-0 forms (every strategy): ``basic`` — stateless
    floor(seq/pageSize) under the dense source-stamped seq;
    ``subject`` — stateless bucket + keyed first-seen state
    (stateful.subject_page_stream); ``time`` (tumbling/sliding) —
    stateless window bucket map; ``substring`` — TrieStage (the
    versioned-counter trie cascade as a job stage); ``geospatial`` —
    _geo_stage (per-tile pager with the bucketless sentinel fallback in
    one stateful op; the standalone GeoStreamJob remains the form with
    streaming geo RELATIONS).

    Children: ``basic`` (per-parent page-counter state), ``subject``
    (stateless map + first-seen tags), ``substring`` (TrieStage with
    ``within_parent`` — the per-parent cascade with versioned
    parent\\x1fnode (_PSEP) counters; cross-key coordination per level is why
    this is a job stage, not keyed state), ``geospatial`` (per-(parent,
    tile) pager incl. sentinel fallback), ``time`` (stateless
    ``parent/window-start`` map)."""
    from pyspark.sql import functions as F

    from bucketizers_spark.config import JobSpec, spec_from_dict
    from bucketizers_spark.streaming.stateful import (
        paged_stream,
        subject_page_stream,
    )

    if isinstance(spec, dict):
        spec = spec_from_dict(spec)
    if spec.strategy != "multi":
        raise ValueError("stages_from_spec takes a multi spec")
    # fail bad streaming specs at configuration time (ConfigError with
    # the session-window rationale), not when the stream starts
    from bucketizers_spark.config import validate_spec

    validate_spec(spec, streaming=True)

    def time_bucket(s, sub: JobSpec, parent: str | None):
        win = sub.window
        col = sub.column or "event_time"
        w = (
            F.window(F.col(col), win.duration, win.slide)
            if win.kind == "sliding"
            else F.window(F.col(col), win.duration)
        )
        if parent:
            # keep _parent/_wstart: the tumbling child's boundary-chain
            # relations are lead-links over OBSERVED windows per parent —
            # not append-monotone, so relations_from_spec derives them at
            # read time from the staged output (BatchDerivedRelations),
            # which needs these columns un-parsed
            return (
                s.drop("_parent", "_wstart")
                .withColumnRenamed("bucket_id", parent)
                .withColumn("_wstart", w["start"])
                .withColumn(
                    "bucket_id",
                    F.concat(
                        F.col(parent),
                        F.lit("/"),
                        F.date_format("_wstart", "yyyy-MM-dd HH:mm:ss"),
                    ),
                )
            )
        return s.withColumn(
            "bucket_id", F.date_format(w["start"], "yyyy-MM-dd HH:mm:ss")
        )

    stages = []
    for k, sub in enumerate(spec.configs):
        if k == 0:
            if sub.strategy == "basic":
                # with seq stamped densely at the source the global pager
                # is the stateless map floor(seq/pageSize) — the
                # production path (operators/basic._with_rank0 dense_seq;
                # paged_stream's docstring explains why no keyed-state
                # form exists)
                stages.append(
                    lambda s, c=sub: s.withColumn(
                        "bucket_id",
                        F.floor(F.col("seq") / F.lit(c.page_size)).cast(
                            "string"
                        ),
                    )
                )
            elif sub.strategy == "subject":
                stages.append(
                    lambda s, c=sub: subject_page_stream(
                        s, c.column, salt=c.salt
                    )
                )
            elif sub.strategy == "time" and sub.window.kind in (
                "tumbling", "sliding",
            ):
                stages.append(lambda s, c=sub: time_bucket(s, c, None))
            elif sub.strategy == "substring":
                stages.append(
                    TrieStage(
                        mode="token" if sub.token_mode else "char",
                        value_col=sub.column or "tokens",
                        page_size=sub.page_size,
                        max_depth=sub.max_depth,
                        root=sub.root,
                    )
                )
            elif sub.strategy == "geospatial":
                # one stateful op incl. the bucketless sentinel fallback
                # (see _geo_stage); relations stream incrementally from
                # the staged flags (relations_from_spec → GeoRelTee,
                # the same versioned root→column dedup the standalone
                # GeoStreamJob runs per batch)
                stages.append(
                    lambda s, c=sub: _geo_stage(s, c, with_parent=False)
                )
            else:
                raise NotImplementedError(
                    f"streaming stage-1 form for {sub.strategy!r}"
                )
        else:
            if sub.strategy == "basic":
                stages.append(
                    lambda s, c=sub: paged_stream(
                        s,
                        "bucket_id",
                        page_size=c.page_size,
                        emit_page_first=True,
                    )
                )
            elif sub.strategy == "time" and sub.window.kind in (
                "tumbling", "sliding",
            ):
                stages.append(lambda s, c=sub: time_bucket(s, c, "_parent"))
            elif sub.strategy == "subject":
                # the subject child's ASSIGNMENT is a stateless
                # parent/normalized-child map (operators/multi.
                # subject_within_parent builds the same expression);
                # keyed first-seen tagging rides along so the per-parent
                # rotation tee (relations_from_spec) is a single further
                # stateful step
                def subj_child(s, c=sub):
                    from bucketizers_spark.functions.normalize import (
                        normalize_subject_col,
                    )
                    from bucketizers_spark.streaming.stateful import (
                        first_seen_tag,
                    )

                    raw = F.col(c.column).cast("string")
                    last = F.element_at(F.split(raw, "/"), -1)
                    child = normalize_subject_col(
                        F.concat(last, F.lit("-" + c.salt))
                    )
                    tagged = (
                        # a subject stage-0 upstream leaves its own
                        # is_first/_parent columns — this stage's tags
                        # replace them
                        s.drop("is_first", "_parent")
                        .withColumnRenamed("bucket_id", "_parent")
                        .withColumn("subject_value", raw)
                        .withColumn(
                            "bucket_id",
                            F.concat_ws("/", F.col("_parent"), child),
                        )
                    )
                    return first_seen_tag(tagged)

                stages.append(subj_child)
            elif sub.strategy == "geospatial":
                stages.append(
                    lambda s, c=sub: _geo_stage(s, c, with_parent=True)
                )
            elif sub.strategy == "substring":
                # per-parent trie child as a job stage: the cascade with
                # parent_col + versioned parent\x1fnode (_PSEP) counters — the
                # cross-key state shape keyed state cannot express
                stages.append(
                    TrieStage(
                        mode="token" if sub.token_mode else "char",
                        value_col=sub.column or "tokens",
                        page_size=sub.page_size,
                        max_depth=sub.max_depth,
                        within_parent=True,
                    )
                )
            else:
                raise NotImplementedError(
                    f"streaming child form for {sub.strategy!r} (batch "
                    "multi supports it; streaming children currently: "
                    "basic, subject, substring, geospatial, time)"
                )
    return stages


def relations_from_spec(spec) -> list:
    """Per-stage relation-tee transforms aligned 1:1 with
    ``stages_from_spec`` (pass both to ``compose_streams``). Each tee
    consumes its stage's staged output as a file stream and emits rows
    in RELATIONS_SCHEMA:

    - stage 0 ``subject``: the single-key rotation state
      (stateful.rotation_stream — EqualThan per first-seen bucket,
      Relation per root rotation, reference
      SubjectPageBucketizer.ts:55-72), mapped onto the batch relation
      columns.
    - stage 0 ``basic``: stateless boundary tee (page and first row are
      pure functions of the dense seq).
    - stage 0 ``time`` (tumbling): BatchDerivedRelations over the
      staged output (bucket ids sort chronologically).
    - child ``basic``: a STATELESS filter — paged_stream stamps
      ``is_page_first``/``rel_from`` on the assignment stream, so the
      per-parent page link (operators/multi.paged_within_parent
      semantics) needs no further state.
    - child ``subject``: a per-PARENT rotation (rotation_stream with
      ``parent_col`` — dedicated counter state per parent, root names
      collapsing onto the parent like operators/multi.
      subject_within_parent).
    - child ``time`` (tumbling): BatchDerivedRelations — the boundary
      chain between observed windows per parent, computed over the
      staged output at read time (see BatchDerivedRelations for why it
      cannot stream).
    - ``geospatial`` (stage 0 or child): GeoRelTee — an incremental
      foreachBatch tee over the staged flags+leaf columns: column →
      leaf-page and bucketless links per is_new_page row, root/parent →
      column deduped across batches with a versioned emitted-columns
      table (the GeoStreamJob pattern), so relations stream out without
      rescanning the staged output.
    - others: None (substring relations — stage 0 or child — live in
      TrieStage's job sink and surface via read_relations(); sliding
      children have no relations in batch either)."""
    from pyspark.sql import functions as F

    from bucketizers_spark.config import spec_from_dict
    from bucketizers_spark.operators.core import relation_row
    from bucketizers_spark.streaming.stateful import rotation_stream

    if isinstance(spec, dict):
        spec = spec_from_dict(spec)
    if spec.strategy != "multi":
        raise ValueError("relations_from_spec takes a multi spec")

    def _map_rot(rot, c):
        # batch relation_row stamps property_path on EqualThan rows only
        # (rotation Relations carry NULL path)
        pp = getattr(c, "property_path", None)
        path = (
            F.when(F.col("relation_type") == "EqualThan", F.lit(pp))
            if pp
            else F.lit(None)
        )
        return rot.select(
            F.col("from_bucket"),
            F.col("relation_type"),
            F.col("to_bucket"),
            F.when(
                F.col("value").isNotNull(), F.array(F.col("value"))
            ).alias("values"),
            path.cast("string").alias("path"),
            F.col("seq").alias("created_at_seq"),
        )

    def subject_rels(s, c):
        return _map_rot(
            rotation_stream(s, max_relations=c.max_relations, root=c.root), c
        )

    def subject_child_rels(s, c):
        return _map_rot(
            rotation_stream(
                s, max_relations=c.max_relations, parent_col="_parent"
            ),
            c,
        )

    def basic_rels(s, c):
        return s.where(
            F.col("is_page_first") & F.col("rel_from").isNotNull()
        ).select(
            *relation_row(
                F.col("rel_from"),
                "Relation",
                F.col("bucket_id"),
                seq=F.col("seq"),
            )
        )

    def time_child_rels(df):
        from pyspark.sql import Window

        fmt = "yyyy-MM-dd HH:mm:ss"
        wins = df.groupBy("_parent", "_wstart").agg(
            F.count(F.lit(1)).alias("n")
        )
        nxt = F.lead("_wstart").over(
            Window.partitionBy("_parent").orderBy("_wstart")
        )
        rel_src = wins.withColumn("_next", nxt).where(
            F.col("_next").isNotNull()
        )
        return rel_src.select(
            *relation_row(
                F.concat(
                    F.col("_parent"), F.lit("/"), F.date_format("_wstart", fmt)
                ),
                "Relation",
                F.concat(
                    F.col("_parent"), F.lit("/"), F.date_format("_next", fmt)
                ),
            )
        )

    def basic_stage0_rels(s, c):
        # boundary relation with each page's first member (page >= 1):
        # stateless under dense seq — the page and its first row are
        # pure functions of seq (operators/basic._boundary_relations)
        page = F.floor(F.col("seq") / F.lit(c.page_size))
        return s.where(
            (F.col("seq") % c.page_size == 0) & (page >= 1)
        ).select(
            *relation_row(
                (page - 1).cast("string"),
                "Relation",
                page.cast("string"),
                seq=F.col("seq"),
            )
        )

    def time_stage0_rels(df):
        # boundary chain between observed windows: bucket_id IS
        # date_format(start, "yyyy-MM-dd HH:mm:ss"), which sorts
        # lexicographically == chronologically, so the chain derives
        # from the staged output alone (operators/time_window.
        # tumbling_bucketizer relations; batch-derived for the same
        # late-window retraction reason as the time child)
        from pyspark.sql import Window

        wins = df.select("bucket_id").distinct()
        nxt = F.lead("bucket_id").over(Window.orderBy("bucket_id"))
        rel_src = wins.withColumn("_next", nxt).where(
            F.col("_next").isNotNull()
        )
        return rel_src.select(
            *relation_row(F.col("bucket_id"), "Relation", F.col("_next"))
        )

    rels: list = []
    for k, sub in enumerate(spec.configs):
        if k == 0 and sub.strategy == "basic":
            rels.append(lambda s, c=sub: basic_stage0_rels(s, c))
        elif k == 0 and sub.strategy == "subject":
            rels.append(lambda s, c=sub: subject_rels(s, c))
        elif (
            k == 0
            and sub.strategy == "time"
            and sub.window.kind == "tumbling"
        ):
            rels.append(BatchDerivedRelations(time_stage0_rels))
        elif k > 0 and sub.strategy == "basic":
            rels.append(lambda s, c=sub: basic_rels(s, c))
        elif k > 0 and sub.strategy == "subject":
            rels.append(lambda s, c=sub: subject_child_rels(s, c))
        elif (
            k > 0
            and sub.strategy == "time"
            and sub.window.kind == "tumbling"
        ):
            # operators/multi.time_within_parent boundary chain; batch-
            # derived because lead-links over observed windows retract
            # when a late window lands between two linked ones
            rels.append(BatchDerivedRelations(time_child_rels))
        elif sub.strategy == "geospatial":
            # composed geo stages: INCREMENTAL relation tee driven by
            # the pager flags with versioned root→column dedup (GeoRelTee
            # — r4 VERDICT #3; the previous BatchDerivedRelations form
            # rescanned the complete staged output per listing)
            rels.append(GeoRelTee(sub, with_parent=(k > 0)))
        else:
            rels.append(None)
    return rels


def compose_streams(
    input_stream: DataFrame,
    stages: Sequence[Callable[[DataFrame], DataFrame]],
    workdir: str,
    *,
    max_files_per_trigger: int = 1,
    relations: Sequence | None = None,
) -> ComposedStreams:
    """Build (without starting) a staged multi-stage streaming composition;
    see ComposedStreams. Re-invoking with the same ``workdir`` resumes
    from each stage's checkpoint. ``relations`` (from
    ``relations_from_spec``) adds per-stage relation tees; read them
    with ``read_relations()``."""
    return ComposedStreams(
        input_stream,
        stages,
        workdir,
        max_files_per_trigger=max_files_per_trigger,
        relations=relations,
    )
