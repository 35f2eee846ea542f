"""Persistent IVF index: build once, probe many — the serving split of
the IVF ANN operator (operators/ivf.py computes everything inline; this
module persists the expensive parts so repeated query batches skip
them).

An IVF index is just two tables, which is exactly how a lakehouse
serves ANN (e.g. a "vector index" in table format):

- ``centroids``: K rows (c_id, ce array<double>) — the trained (or
  lowest-id) centroid set. Tiny; always broadcast at query time.
- ``cells``: n rows (vec_id, cell) — every vector's nearest-centroid
  assignment. This is the table whose recompute costs a full corpus
  pass per query batch; persisted it costs one pass EVER (plus
  incremental appends for new vectors — assign_cells over the new rows
  only, an append-only maintenance job).

Query path reads both tables, probes nprobe cells, and rescores
exactly inside them — identical math to ivf_topk (the pytest pins
results equal), but the corpus-sized work at query time is one equijoin
on the cell id against pruned parquet.

Scale notes: ``cells`` is written partitioned by cell bucket (cell %
n_files) so a probe's equijoin prunes files (partition pruning on the
join key's bucket); centroids are a single small file. Both tables are
plain parquet — no format extension, readable by any engine.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bucketizers_spark.operators.ivf import (
    assign_cells,
    ivf_topk,
    kmeans_centroids,
    lowest_id_centroids,
)


class IvfIndex:
    """Handle to a persisted IVF index directory (centroids/ + cells/)."""

    def __init__(self, path: str):
        self.path = path

    @property
    def _centroids_path(self) -> str:
        return os.path.join(self.path, "centroids")

    @property
    def _cells_path(self) -> str:
        return os.path.join(self.path, "cells")

    @classmethod
    def build(
        cls,
        emb: DataFrame,
        path: str,
        *,
        k: int = 16,
        trained: bool = True,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
        cell_buckets: int = 16,
    ) -> "IvfIndex":
        """Train (or pick) centroids, assign every vector to its cell,
        persist both. ``trained=True`` uses the seeded sampled-k-means
        builder; False uses the lowest-id centroids (the
        oracle-replayable form). ``cell_buckets`` partitions the cells
        table on cell id so query-time probes prune files."""
        cents = (
            kmeans_centroids(emb, k, id_col=id_col, emb_col=emb_col)
            if trained
            else lowest_id_centroids(emb, k, id_col=id_col, emb_col=emb_col)
        )
        # centroids are K rows — coalesce(1) is bounded by construction
        cents.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, "centroids")
        )
        cells = assign_cells(emb, cents, id_col=id_col, emb_col=emb_col)
        (
            cells.withColumn("cell_bucket", F.col("cell") % cell_buckets)
            .write.mode("overwrite")
            .partitionBy("cell_bucket")
            .parquet(os.path.join(path, "cells"))
        )
        return cls(path)

    def centroids(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self._centroids_path)

    def cells(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self._cells_path).drop("cell_bucket")

    def search(
        self,
        emb: DataFrame,
        queries: DataFrame,
        *,
        nprobe: int = 4,
        topk: int = 10,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
        query_id_col: str = "query_id",
        query_emb_col: str = "qe",
    ) -> DataFrame:
        """Top-k per query using the PERSISTED cell table — no
        corpus-wide assignment at query time. ``emb`` supplies the
        vectors for exact rescoring (the index stores ids, not
        payloads, like every inverted index)."""
        from pyspark.sql.window import Window

        spark = emb.sparkSession
        cents = self.centroids(spark)
        cells = self.cells(spark)
        from bucketizers_spark.operators.ivf import _cosine

        qscored = queries.crossJoin(F.broadcast(cents)).select(
            query_id_col,
            query_emb_col,
            F.col("c_id").alias("cell"),
            F.round(
                _cosine(F.col(query_emb_col), F.col("ce")), 4
            ).alias("_cs"),
        )
        wq = Window.partitionBy(query_id_col).orderBy(
            F.col("_cs").desc(), F.col("cell")
        )
        probes = (
            qscored.withColumn("_pr", F.row_number().over(wq))
            .where(F.col("_pr") <= nprobe)
            .select(query_id_col, query_emb_col, "cell")
        )
        members = cells.join(emb.select(id_col, emb_col), id_col)
        # self-match exclusion only applies when the corpus-id and
        # query-id columns share a type — i.e. the ids live in one id
        # space where a query CAN be its own corpus row. With different
        # types the spaces are disjoint by construction and the old
        # unconditional != either silently discarded every candidate
        # (cast → NULL) or threw under ANSI casting (ADVICE r5); the
        # plan-time type check sidesteps both. Null-safe negation so a
        # NULL corpus id is kept as an ordinary non-self candidate.
        cand = probes.join(members, "cell")
        id_t = emb.schema[id_col].dataType
        q_t = queries.schema[query_id_col].dataType
        numeric = ("byte", "short", "integer", "long", "float", "double")

        def _is_num(t):
            return t.typeName() in numeric

        if id_t == q_t:
            cand = cand.where(
                ~F.col(id_col).eqNullSafe(F.col(query_id_col))
            )
        elif _is_num(id_t) and _is_num(q_t):
            # ADVICE r6: ids in one numeric id space previously compared
            # via numeric widening — only skip the exclusion for
            # INCOMPARABLE type families (e.g. string vs numeric), and
            # compare numerics on a common widened cast so a query never
            # silently appears in its own top-k.
            cand = cand.where(
                ~F.col(id_col)
                .cast("double")
                .eqNullSafe(F.col(query_id_col).cast("double"))
            )
        sim = F.round(_cosine(F.col(query_emb_col), F.col(emb_col)), 4)
        scored = (
            cand.select(query_id_col, id_col, sim.alias("sim_r4"))
            .groupBy(query_id_col, id_col)
            .agg(F.max("sim_r4").alias("sim_r4"))
        )
        w = Window.partitionBy(query_id_col).orderBy(
            F.col("sim_r4").desc(), F.col(id_col)
        )
        return scored.withColumn("rk", F.row_number().over(w)).where(
            F.col("rk") <= topk
        )

    def append(
        self,
        new_emb: DataFrame,
        *,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
        cell_buckets: int = 16,
    ) -> None:
        """Incremental maintenance: assign ONLY the new vectors against
        the frozen centroids and append their cell rows — the constant
        small job that keeps the index current between (rare) retrain
        rebuilds."""
        spark = new_emb.sparkSession
        cents = self.centroids(spark)
        cells = assign_cells(
            new_emb, cents, id_col=id_col, emb_col=emb_col
        )
        (
            cells.withColumn("cell_bucket", F.col("cell") % cell_buckets)
            .write.mode("append")
            .partitionBy("cell_bucket")
            .parquet(self._cells_path)
        )
