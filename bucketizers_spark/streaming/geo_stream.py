"""Streaming geospatial bucketizer (S4 streaming form).

Reference
(/root/reference/packages/bucketizer-geospatial/lib/GeospatialBucketizer.ts:58-114):
per-tile page counters (``tilesMap``: tile → [page, counter]) filled in
arrival order; a GeospatiallyContains relation per new page; root →
column emitted once per column with the FIRST tile's bbox.

Streaming realization:
- stage 0 (stateless, JVM): WKT → distinct integer tiles
  (operators/geospatial.tile_array_col) → posexplode; non-WKT / poles
  route to the fallback side-output exactly like the batch op.
- stage 1 (keyed state): ``applyInPandasWithState`` keyed by tile leaf;
  state = lifetime member count. Page = idx // page_size is a pure
  function of the count, so the kernel is one numpy arange per batch —
  no per-row Python. Rows carry ``is_new_tile`` / ``is_new_page`` flags,
  from which the relation events derive statelessly
  (``relations_from_flags``): new-page rows are the column → leaf-page
  relations; the first new-tile row per column is the root → column
  relation (exactly once across the stream because a tile is new only
  once, and the column's first tile is new in exactly one batch).

Like the other keyed-state kernels, tile state lives forever (the
reference never evicts tilesMap); tile cardinality is bounded by 4^zoom.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from bucketizers_spark.operators.geospatial import tile_array_col, tile_bbox_wkt

_PAGER_STATE = T.StructType([T.StructField("cnt", T.LongType())])


def _make_tile_pager_fn(page_size: int, seq_col: str):
    def fn(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        cnt = state.get[0] if state.exists else 0
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values([seq_col, "_tpos"]).reset_index(drop=True)
            idx = cnt + np.arange(len(pdf), dtype=np.int64)
            pdf["_page"] = idx // page_size
            pdf["is_new_tile"] = idx == 0
            pdf["is_new_page"] = idx % page_size == 0
            cnt = int(cnt + len(pdf))
            yield pdf
        state.update((cnt,))

    return fn


def geospatial_assign_stream(
    stream_df: DataFrame,
    value_col: str,
    *,
    zoom: int = 4,
    page_size: int = 50,
    seq_col: str = "seq",
) -> tuple[DataFrame, DataFrame]:
    """Returns (assignments, unmatched): the member stream with
    ``bucket_id`` (= leaf-page) plus the new-tile/new-page flags, and the
    fallback side-output stream (non-WKT / pole rows) for the caller to
    route through the bucketless pager."""
    payload_cols = stream_df.columns
    work = stream_df.withColumn("_tiles", tile_array_col(value_col, zoom))
    bad = F.exists(F.col("_tiles"), lambda t: t["y"].isNull())
    # null-safe (see operators/geospatial): NULL values must route
    # to unmatched, not vanish in three-valued logic
    is_matched = F.coalesce((F.size("_tiles") > 0) & ~bad, F.lit(False))
    unmatched = work.where(~is_matched).drop("_tiles")
    exploded = (
        work.where(is_matched)
        .select(*payload_cols, F.posexplode("_tiles").alias("_tpos", "_t"))
        .withColumn(
            "_leaf",
            F.concat_ws("/", F.lit(str(zoom)), F.col("_t.x"), F.col("_t.y")),
        )
        .drop("_t")
    )
    out_schema = T.StructType(
        [f for f in exploded.schema.fields]
        + [
            T.StructField("_page", T.LongType()),
            T.StructField("is_new_tile", T.BooleanType()),
            T.StructField("is_new_page", T.BooleanType()),
        ]
    )
    flagged = exploded.groupBy("_leaf").applyInPandasWithState(
        _make_tile_pager_fn(page_size, seq_col),
        outputStructType=out_schema,
        stateStructType=_PAGER_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    assignments = flagged.withColumn(
        "bucket_id", F.concat(F.col("_leaf"), F.lit("-"), F.col("_page"))
    )
    return assignments, unmatched


def relations_from_flags(
    flagged: DataFrame, *, root: str = "root", seq_col: str = "seq"
) -> DataFrame:
    """Derive the relation events from the flagged assignment rows: one
    column → leaf-page per is_new_page row; one root → column per column,
    carried by its earliest new-tile row. The bbox zoom comes from the
    leaf path itself ('z/x/y'). Exact over the WHOLE flagged set (batch
    mode); per micro-batch the root → column rows need the cross-batch
    dedup GeoStreamJob keeps (a column whose second tile is first seen in
    a later batch would re-emit)."""
    from pyspark.sql.functions import pandas_udf

    from bucketizers_spark.operators.core import relation_row

    @pandas_udf("string")
    def bbox_of(leaf: pd.Series) -> pd.Series:
        def one(s: str) -> str:
            _, xs, ys = s.split("/")
            return tile_bbox_wkt(int(xs), int(ys), int(s.split("/")[0]))

        return leaf.map(one)

    column = F.regexp_replace(F.col("_leaf"), r"/[^/]+$", "")
    pages = flagged.where(F.col("is_new_page")).withColumn(
        "_bbox", bbox_of(F.col("_leaf"))
    )
    column_rels = pages.select(
        *relation_row(
            column,
            "GeospatiallyContains",
            F.concat(F.col("_leaf"), F.lit("-"), F.col("_page")),
            values=F.array(F.col("_bbox")),
            seq=F.col(seq_col),
        )
    )
    firsts = (
        flagged.where(F.col("is_new_tile"))
        .withColumn("_col", column)
        .groupBy("_col")
        .agg(
            F.min(seq_col).alias("created_at_seq"),
            # (seq, _tpos): a member's tiles share seq — pair order
            # breaks the tie like the reference's tilesMap walk
            F.min_by(
                "_leaf", F.struct(F.col(seq_col), F.col("_tpos"))
            ).alias("_first_leaf"),
        )
        .withColumn("_bbox", bbox_of(F.col("_first_leaf")))
    )
    root_rels = firsts.select(
        *relation_row(
            F.lit(root),
            "GeospatiallyContains",
            F.col("_col"),
            values=F.array(F.col("_bbox")),
            seq=F.col("created_at_seq"),
        )
    )
    return column_rels.unionByName(root_rels)


class GeoStreamJob:
    """foreachBatch shell around the flagged assignment stream: idempotent
    assignment + relation sinks, with a versioned emitted-columns table
    (same transactional pattern as TrieStreamJob: state version written
    BEFORE the sink manifest commit; a replayed batch recomputes from the
    previous version and overwrites its own idempotently) so the
    root → column relation is emitted exactly once per column across the
    stream's lifetime."""

    def __init__(self, sink_root: str, state_dir: str, *, zoom: int = 4,
                 root: str = "root", seq_col: str = "seq"):
        import os

        from bucketizers_spark.sinks.idempotent import IdempotentParquetSink

        self.sink = IdempotentParquetSink(sink_root)
        self.rel_sink = IdempotentParquetSink(os.path.join(sink_root, "_relations"))
        self.fb_sink = IdempotentParquetSink(os.path.join(sink_root, "_fallback"))
        self.state_dir = state_dir
        self.zoom = zoom
        self.root = root
        self.seq_col = seq_col
        os.makedirs(os.path.join(state_dir, "columns"), exist_ok=True)

    def _emitted_columns(self, spark, before_batch: int):
        import glob
        import os

        versions = sorted(
            int(os.path.basename(p).split("=")[1])
            for p in glob.glob(os.path.join(self.state_dir, "columns", "v=*"))
            if os.path.exists(os.path.join(p, "_SUCCESS"))
        )
        versions = [v for v in versions if v < before_batch]
        if not versions:
            return None
        return spark.read.parquet(
            os.path.join(self.state_dir, "columns", f"v={versions[-1]}")
        )

    def process_batch(self, flagged: DataFrame, batch_id: int):
        import os

        spark = flagged.sparkSession
        if batch_id in self.sink.committed_batches():
            return
        flagged = flagged.persist()
        rels = relations_from_flags(
            flagged, root=self.root, seq_col=self.seq_col
        )
        emitted = self._emitted_columns(spark, batch_id)
        if emitted is not None:
            root_rels = rels.where(F.col("from_bucket") == self.root).join(
                emitted.withColumnRenamed("column", "to_bucket"),
                "to_bucket",
                "left_anti",
            )
        else:
            root_rels = rels.where(F.col("from_bucket") == self.root)
        rels_out = rels.where(F.col("from_bucket") != self.root).unionByName(
            root_rels
        ).persist()
        new_cols = root_rels.select(F.col("to_bucket").alias("column"))
        all_cols = (
            new_cols
            if emitted is None
            else emitted.unionByName(new_cols).distinct()
        )
        # state BEFORE the sink manifest commit (cf. TrieStreamJob)
        all_cols.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, "columns", f"v={batch_id}")
        )
        self.rel_sink.write_batch(rels_out, batch_id)
        assignments = flagged.withColumn(
            "bucket_id", F.concat(F.col("_leaf"), F.lit("-"), F.col("_page"))
        ).drop("is_new_tile", "is_new_page", "_tpos")
        self.sink.foreach_batch()(assignments, batch_id)
        rels_out.unpersist()
        flagged.unpersist()

    def start(self, flagged_stream: DataFrame, checkpoint_dir: str):
        return (
            flagged_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .start()
        )

    def start_with_fallback(
        self,
        stream_df: DataFrame,
        value_col: str,
        checkpoint_root: str,
        *,
        page_size: int = 50,
    ):
        """Front door matching the batch pipeline's automatic routing
        (pipeline.route_with_fallback / _build_geospatial): splits the raw
        member stream itself, runs the tile pager on matched rows and the
        bucketless pager (stateful.fallback_stream) on the non-WKT / pole
        side-output — streaming callers no longer hand-wire the unmatched
        stream (reference behavior: BucketizerCore.ts:294-309 routes
        bad-datatype members automatically). Returns the two queries;
        combined output via read_assignments()."""
        import os

        from bucketizers_spark.streaming.stateful import fallback_stream

        flagged, unmatched = geospatial_assign_stream(
            stream_df, value_col, zoom=self.zoom,
            page_size=page_size, seq_col=self.seq_col,
        )
        q_main = self.start(flagged, os.path.join(checkpoint_root, "geo"))
        fb = fallback_stream(
            unmatched, page_size=page_size, seq_col=self.seq_col
        )
        q_fb = (
            fb.writeStream.foreachBatch(self.fb_sink.foreach_batch())
            .option(
                "checkpointLocation", os.path.join(checkpoint_root, "fallback")
            )
            .outputMode("append")
            .start()
        )
        return q_main, q_fb

    def read_assignments(self, spark):
        """All assignment rows — tile pages plus bucketless fallback pages
        (the batch route_with_fallback union)."""
        main = self.sink.read_all(spark)
        try:
            fb = self.fb_sink.read_all(spark)
        except FileNotFoundError:  # no unmatched rows ever arrived
            return main
        common = [c for c in main.columns if c in set(fb.columns)]
        return main.select(common).unionByName(fb.select(common))
